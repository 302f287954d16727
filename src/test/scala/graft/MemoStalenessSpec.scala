package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries
import graft.sources.Tables

/** The per-JVM fit memos must not outlive the data they were fit on: a
  * long-lived session that rewrites a corpus directory in place (a
  * VersionedStore-backed re-export, a probe harness regenerating
  * embeddings) must get a fresh fit, never the centroids of the old data.
  * `Tables.fitKey` keys the memo by (dir, manifest fingerprint) and, on a
  * fingerprint change, refreshes Spark's path-matched relation cache so the
  * retrain reads the new files rather than a stale cached snapshot
  * (`InMemoryFileIndex` equality matches on root path alone).
  */
class MemoStalenessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("manifest fingerprint is stable across reads and changes on rewrite") {
    val dir = Files.createTempDirectory("graft-memo").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.write.parquet(s"$dir/embeddings.parquet")
    val fp1 = Tables.manifestFingerprint(spark, dir, "embeddings")
    assert(fp1 == Tables.manifestFingerprint(spark, dir, "embeddings"))
    emb.limit(300).write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    assert(Tables.manifestFingerprint(spark, dir, "embeddings") != fp1)
  }

  test("k-means centroid memo refreshes when the embeddings dir is rewritten in-JVM") {
    val dir = Files.createTempDirectory("graft-memo-km").toString
    val fresh = Files.createTempDirectory("graft-memo-km-fresh").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.write.parquet(s"$dir/embeddings.parquet")

    val fitA = SimilarityQueries.kmCentroids(spark, dir)

    // Rewrite in place: drop half the corpus and renumber — different data
    // under the SAME path, the exact hazard the fingerprint key guards.
    val rewritten = emb.where(col("vec_id") >= 250)
      .withColumn("vec_id", col("vec_id") - 250)
    rewritten.write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")

    val fitB = SimilarityQueries.kmCentroids(spark, dir)

    // The refreshed fit must be the fit OF THE NEW DATA: bit-identical to a
    // cold fit on a pristine copy in a different directory (the trainer is
    // fully deterministic).
    rewritten.write.parquet(s"$fresh/embeddings.parquet")
    val fitFresh = SimilarityQueries.kmCentroids(spark, fresh)

    def render(f: Seq[(Int, Array[Long])]) = f.map { case (c, v) => (c, v.toSeq) }
    assert(render(fitB) == render(fitFresh),
      "memo served a fit that does not match the rewritten data")
    assert(render(fitB) != render(fitA),
      "rewrite produced an identical fit — test corpus change too weak to detect staleness")
  }
}
