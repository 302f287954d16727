package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.CurationStream

/** v11 streaming incremental curation: the composed stream (exact
  * Δ-vs-index → near-dup Δ-vs-index → frozen quality gate → stateful
  * incremental pack) must equal the ONE-SHOT batch run of the same
  * stages on the full increment, no matter how the increment is split
  * across micro-batches and query restarts — only the per-shard pack
  * state can break that, which is exactly what the test exercises.
  */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("stream == one-shot batch across 3 micro-batches + restarts; exact dups dropped; state stays O(shards)") {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val idx = CurationStream.buildIndexes(base)
    val initState = CurationStream.basePackState(base)

    // increment thirds, ids ascending (the append-only crawl contract):
    // exact re-crawls (same text, new id — the fp index must drop all),
    // near-dups (small textual edit — the band probe catches the long
    // ones), fresh docs (every token position-salted: zero shared
    // shingles, so only the quality gate filters them)
    val exact = base.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val near = base.where(col("doc_id") % 3 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" updated revision two")).as("text"))
    val fresh = base.where(col("doc_id") % 3 === 2)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        expr("array_join(transform(filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')," +
          " (t, i) -> concat(t, 'q', CAST(i AS STRING))), ' ')").as("text"))

    // one-shot batch reference over the whole increment
    val full = exact.unionByName(near).unionByName(fresh)
    val (refAsg, refState) = CurationStream.curateBatch(full, idx, initState)
    val refRows = refAsg.select("doc_id", "shard", "bin", "n_tokens")
      .collect().map(_.toSeq).sortBy(_.toString)
    val refStateRows = refState.collect().map(_.toSeq).sortBy(_.toString)

    // stream: three crawl drops, each its own AvailableNow invocation —
    // every boundary is BOTH a micro-batch split and a query restart
    val root = Files.createTempDirectory("graft-v11").toString
    val src = s"$root/src"; val out = s"$root/out"; val st = s"$root/state"; val ck = s"$root/ck"
    new java.io.File(src).mkdirs()
    Seq(exact, near, fresh).foreach { part =>
      part.coalesce(1).write.mode("append").parquet(src)
      CurationStream.run(spark, src, out, st, ck, idx, initState)
    }

    val got = spark.read.parquet(out)
    // the all-exact-dup first batch has zero survivors (no output
    // partition), but EVERY batch commits a state version
    val stateVersions = new java.io.File(st).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
    assert(stateVersions.toSeq == Seq(0L, 1L, 2L),
      s"expected 3 state-committing micro-batches, got $stateVersions")
    val gotRows = got.select("doc_id", "shard", "bin", "n_tokens")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(gotRows.length == refRows.length,
      s"stream packed ${gotRows.length} docs, batch packed ${refRows.length}")
    assert(gotRows.sameElements(refRows), "stream assignments diverge from the one-shot batch")

    // every exact re-crawl was dropped by the fp index
    assert(got.where(col("doc_id").between(1000000L, 1999999L)).isEmpty)
    // the gates actually gated: survivors are a strict subset
    assert(gotRows.length < full.count())

    // final state == batch state, and O(shards) rows
    val vMax = new java.io.File(st).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).max
    val finalState = spark.read.parquet(s"$st/v=$vMax")
    assert(finalState.count() <= CurationStream.Shards)
    assert(finalState.collect().map(_.toSeq).sortBy(_.toString).sameElements(refStateRows),
      "carried pack state diverges from the one-shot batch state")

    // replay idempotence: re-running with no new data changes nothing
    CurationStream.run(spark, src, out, st, ck, idx, initState)
    val again = spark.read.parquet(out).select("doc_id", "shard", "bin", "n_tokens")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(again.sameElements(refRows))
  }
}
