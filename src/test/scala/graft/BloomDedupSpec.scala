package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomExpressions
import graft.queries.DedupQueries

/** d13 Bloom-prefiltered incremental dedup:
  * - the bloom-pruned path must be EXACTLY the plain left join (the bloom
  *   only prunes: no false negatives, false positives removed by the
  *   confirm join);
  * - pruning must actually happen (bloom-negative rows exist and skip the
  *   join) — otherwise the operator is d9 with extra steps;
  * - the membership expression must survive codegen-only mode (no silent
  *   Janino fallback) and reject a non-literal filter argument loudly.
  */
class BloomDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom path == plain left-join path, bit-exact") {
    import graft.functions.Text
    import graft.sources.Tables
    val got = DedupQueries.d13BloomDedup(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.md5Long(Text.normText(col("text"))).as("fpl"))
    val incoming = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("in_id"), col("fpl"))
      .unionByName(Tables.documents(spark, dir).where(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 2000000L).as("in_id"),
          Text.md5Long(concat(Text.normText(col("text")), lit(" fresh "), col("doc_id"))).as("fpl")))
    val plain = incoming.join(docs.select(col("fpl"), col("doc_id").as("corp_id")), Seq("fpl"), "left")
      .groupBy("in_id")
      .agg(min("corp_id").as("dup_of"), count(col("corp_id")).as("n_matches"))
      .orderBy("in_id")
      .collect()
    assert(got.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("bloom actually prunes: negatives exist and are emitted as novel without joining") {
    import spark.implicits._
    val corpus = spark.range(0, 1000).select(col("id").as("fpl"))
    val bloom = corpus.stat.bloomFilter("fpl", 1000, 0.01)
    // increment keys 5000-5999 are all novel: with fpp 1%, ~990+ must be
    // bloom-negative; every corpus key must be bloom-positive (no FNs).
    val inc = spark.range(5000, 6000).select(col("id").as("fpl"))
    val might = BloomExpressions.mightContain(bloom, col("fpl"))
    val negs = inc.where(!might).count()
    assert(negs > 900, s"expected most novel keys pruned, got $negs/1000")
    assert(corpus.where(might).count() == 1000L, "a bloom false negative is impossible")
  }

  test("membership expression compiles under codegen-only (no silent fallback)") {
    import spark.implicits._
    val bloom = spark.range(0, 10).select(col("id").as("f")).stat.bloomFilter("f", 10, 0.01)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val hits = spark.range(0, 20).select(col("id").as("f"))
        .where(BloomExpressions.mightContain(bloom, col("f"))).count()
      assert(hits >= 10L && hits <= 20L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("non-literal bloom argument fails with a named AnalysisException") {
    import spark.implicits._
    Seq((1L, Array[Byte](1, 2))).toDF("f", "b").createOrReplaceTempView("bd_t")
    val e = intercept[AnalysisException](
      spark.sql("SELECT graft_bloom_might_contain(f, b) FROM bd_t").collect())
    assert(e.getMessage.contains("graft_bloom_might_contain"))
  }
}
