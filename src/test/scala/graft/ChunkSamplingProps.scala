package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusQueries, SamplingQueries}

/** Algebraic properties of the chunker and the bottom-k sampler that the
  * DuckDB hash-compare can't express:
  *  - v8 chunks must COVER every token exactly (first chunk starts at 0,
  *    consecutive starts differ by the stride, the last chunk ends at the
  *    doc's token count) — a chunker that silently drops a tail would
  *    still hash-match its own oracle.
  *  - n6's sample must be invariant under partitioning (the whole point
  *    of hash selection over `df.sample`).
  */
class ChunkSamplingProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("v8: chunks tile every document — full coverage, stride spacing, exact tail") {
    val chunks = CorpusQueries.v8Chunk(spark, sfDir)
      .select("doc_id", "chunk_id", "start_tok", "n_tok").cache()
    val perDoc = chunks.groupBy("doc_id").agg(
      min("chunk_id").as("c0"),
      max("chunk_id").as("cmax"),
      count(lit(1)).as("nc"),
      min("start_tok").as("s0"),
      max(col("start_tok") + col("n_tok")).as("covered_end"),
      min("n_tok").as("min_len")).collect()
    val nTokens = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(graft.functions.Text.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.unpersist()

    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (doc, c0, cmax, nc, s0, end) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(c0 == 0L && s0 == 0L, s"doc $doc: first chunk must start at token 0")
      assert(nc == cmax + 1, s"doc $doc: chunk ids must be dense 0..$cmax, got $nc")
      assert(end == nTokens(doc), s"doc $doc: coverage ends at $end, doc has ${nTokens(doc)} tokens")
    }
  }


  test("n9: packing is exhaustive, budget-respecting, and bins are contiguous") {
    val W = 256L
    val packed = SamplingQueries.n9SequencePack(spark, sfDir)
      .select("doc_id", "shard", "bin", "n_tokens").cache()
    // every document is packed exactly once
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(packed.count() == nDocs)
    assert(packed.select("doc_id").distinct().count() == nDocs)
    // no bin exceeds the budget unless it holds a single oversized doc
    val fills = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"), max("n_tokens").as("mx"))
    assert(fills.where(col("fill") > W && !(col("n") === 1 && col("mx") > W)).isEmpty,
      "a multi-doc bin exceeded the token budget")
    // bins are numbered 1..maxBin with no gaps inside a shard
    val gaps = fills.groupBy("shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("n"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(gaps.isEmpty, "bin ids must be dense from 1 per shard")
    // greedy means a doc never fits the PREVIOUS bin it skipped: the doc
    // opening bin b+1 must overflow bin b's fill
    val openTok = packed.groupBy("shard", "bin")
      .agg(expr("min_by(n_tokens, doc_id)").as("opener_tok"))
      .select(col("shard").as("s"), col("bin").as("b"), col("opener_tok"))
    val viol = fills.join(openTok, fills("shard") === col("s") && (fills("bin") + 1) === col("b"))
      .where(col("fill") + col("opener_tok") <= W)
    assert(viol.isEmpty, "a bin was opened although its first doc fit the previous bin")
    packed.unpersist()
  }

  test("n6: bottom-k sample is exactly k and invariant under repartitioning") {
    val base = SamplingQueries.n6BottomKSample(spark, sfDir).collect()
    assert(base.length == 500)
    // hash selection must not depend on physical layout: same 500 rows
    // from a deliberately scrambled layout of the same table
    val scrambled = graft.sources.Tables.orders(spark, sfDir)
      .repartition(17, col("o_custkey"))
      .select(col("o_orderkey"),
        md5(concat(lit("n6:"), col("o_orderkey").cast("string"))).as("h"))
      .orderBy("h").limit(500).collect()
    assert(base.map(_.getString(1)).toSeq == scrambled.map(_.getString(1)).toSeq)
  }
}
