package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Deterministic corpus-trained byte-pair encoding — the real subword
  * tokenizer behind every token budget in the curation pipeline
  * (whitespace counts differ from BPE counts 1.3–1.7× by language, which
  * skews mix/pack decisions; the reference's pipeline feeds an LLM-side
  * consumer, /root/reference/README_en.md:1-10).
  *
  * Training is classic Sennrich BPE, expressed Spark-first and fully
  * deterministic (no RNG, lexical tie-breaks):
  *  - it runs on the WORD-TYPE relation (w, cnt) — Zipf makes types ≪
  *    tokens, so every merge round touches a vocabulary-sized frame, not
  *    the corpus. The corpus is scanned exactly twice: once for the word
  *    counts, once for the final per-doc encode join.
  *  - each word is a string of sentinel-wrapped symbols
  *    (`<S>sym<E>` …): applying merge (a,b) is ONE literal
  *    `replace` — string replace is greedy left-to-right non-overlapping,
  *    which IS the BPE merge rule, and the per-symbol wrapping makes a
  *    cross-symbol-boundary false match impossible (a pattern starts with
  *    `<S>`, which only occurs at symbol starts). DuckDB's `replace`
  *    has identical semantics, so the oracle replays training verbatim.
  *  - pair stats count overlapping occurrences weighted by word count
  *    (the Sennrich rule); the winner is (count DESC, a ASC, b ASC) —
  *    one vocabulary-sized aggregation + a 1-row collect per round
  *    (merge ranks are driver state, like k-means centroids).
  *
  * At 100 TB: word counting is one partial-agg shuffle; the type relation
  * is capped in practice (min-count floor or top-K types — a 10⁶-type
  * table saturates BPE statistics); rounds are vocabulary-sized jobs;
  * the encode is a broadcast join of the type→length table.
  *
  * Known codegen note: the 16-deep chained-replace encode expression
  * exceeds Janino's 64 KB method limit, so that one projection runs
  * interpreted (Spark's automatic fallback). It only ever evaluates over
  * the VOCABULARY-sized type relation — the corpus-sized side of the
  * encode join sees plain codegen — so the fallback is a non-cost by
  * construction, accepted rather than worked around.
  */
object Bpe {

  /** Merge rounds trained/applied everywhere (gate + oracle must agree). */
  val Rounds = 16

  private val S = "\u0001"
  private val E = "\u0002"

  /** Word-type relation (w, cnt) over whitespace tokens of normText. */
  def wordTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Initial symbolization: every character sentinel-wrapped. */
  private def wrapInit(w: Column): Column =
    array_join(
      transform(filter(split(w, ""), c => c =!= lit("")),
        c => concat(lit(S), c, lit(E))),
      "")

  /** Wrapped string → symbol array. */
  private def syms(sym: Column): Column =
    filter(split(translate(sym, S, ""), E), x => x =!= lit(""))

  private def applyMerge(sym: Column, a: String, b: String): Column =
    call_function("replace", sym, lit(S + a + E + S + b + E), lit(S + a + b + E))

  /** Train `rounds` merges; returns (a, b, pairCount) in rank order
    * (possibly shorter if the pair space drains first).
    */
  def train(spark: SparkSession, dir: String, rounds: Int = Rounds): Seq[(String, String, Long)] = {
    var cur = wordTypes(spark, dir)
      .select(col("cnt"), wrapInit(col("w")).as("sym"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var drained = false
    for (_ <- 1 to rounds if !drained) {
      val s = syms(col("sym"))
      val best = cur.where(size(s) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(s) - 1),
          i => struct(element_at(s, i).as("a"), element_at(s, i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) drained = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((a, b, c))
        cur = cur.withColumn("sym", applyMerge(col("sym"), a, b)).localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Type→subword-count table after applying `merges` in rank order —
    * the broadcast side of every encode join.
    */
  def typeTokens(spark: SparkSession, dir: String,
                 merges: Seq[(String, String, Long)]): DataFrame = {
    val enc = merges.foldLeft(wrapInit(col("w"))) { case (sym, (a, b, _)) =>
      applyMerge(sym, a, b)
    }
    wordTypes(spark, dir).select(col("w"), size(syms(enc)).cast("long").as("n_sym"))
  }

  /** Per-doc (doc_id, n_ws, n_bpe): whitespace vs BPE token counts. */
  def docTokens(spark: SparkSession, dir: String,
                merges: Seq[(String, String, Long)]): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .join(broadcast(typeTokens(spark, dir, merges)), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws"), sum("n_sym").as("n_bpe"))

  // ------------------------------------------------------------ oracle

  /** CTE chain replaying training verbatim in DuckDB: `w0..wN` (wrapped
    * vocab per round), `b1..bN` (per-round winning pair + count), `tt`
    * (type→subword count), `dw` (doc_id, w) for encode tails. Callers
    * append their own final SELECT.
    */
  def oracleCtes(rounds: Int = Rounds): String = {
    val head =
      """WITH d AS MATERIALIZED (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |dw AS MATERIALIZED (SELECT doc_id, w FROM (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM d) WHERE length(w) > 0),
        |wt AS MATERIALIZED (SELECT w, count(*) AS cnt FROM dw GROUP BY w),
        |w0 AS MATERIALIZED (SELECT w, cnt, array_to_string(list_transform(string_split(w, ''), c -> chr(1) || c || chr(2)), '') AS sym FROM wt)""".stripMargin
    val roundsSql = (1 to rounds).map { k =>
      s"""l$k AS MATERIALIZED (SELECT cnt, list_filter(string_split(replace(sym, chr(1), ''), chr(2)), x -> x <> '') AS l FROM w${k - 1}),
         |p$k AS (SELECT struct_extract(p, 'a') AS a, struct_extract(p, 'b') AS b, sum(cnt) AS c FROM (
         |  SELECT cnt, unnest(list_transform(range(1, len(l)), i -> {'a': l[i], 'b': l[i+1]})) AS p
         |  FROM l$k WHERE len(l) >= 2) GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
         |w$k AS MATERIALIZED (SELECT w, cnt, CASE WHEN b.a IS NULL THEN sym
         |  ELSE replace(sym, chr(1) || b.a || chr(2) || chr(1) || b.b || chr(2), chr(1) || b.a || b.b || chr(2)) END AS sym
         |FROM w${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin
    }.mkString(",\n")
    val tail =
      s"""tt AS MATERIALIZED (SELECT w, CAST(len(list_filter(string_split(replace(sym, chr(1), ''), chr(2)), x -> x <> '')) AS BIGINT) AS n_sym FROM w$rounds)"""
    s"$head,\n$roundsSql,\n$tail"
  }
}
