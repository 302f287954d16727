package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Corpus-preparation operators (training-data pipeline, builder brief):
  * vocabulary construction, benchmark decontamination, and character-level
  * language profiles. All single-scan + keyed-aggregation shapes — the
  * 100 TB versions differ only in partition counts.
  */
object CorpusQueries {

  private val NGram = 8 // decontamination gram size (the common n for eval leakage)

  /** Vocabulary: top-200 tokens by corpus frequency, deterministic
    * tie-break — the BPE/tokenizer-training input. Map-side partial
    * aggregation does the heavy lifting; only (token, count) pairs shuffle.
    */
  def v1Vocab(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(200)

  val v1Oracle: String =
    """SELECT token, count(1) AS cnt
      |FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 200""".stripMargin

  /** Decontamination: training docs sharing any 8-token gram with the eval
    * split (stand-in: doc_id ≡ 0 mod 11) are flagged with their overlap
    * count. Inverted-index equi-join on the gram — same scale shape as the
    * dedup candidate join; the eval side is tiny and broadcasts.
    */
  def v2Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // materialize tokens BEFORE the shingle lambda: HOFs are interpreted
    // (no codegen/CSE), so an inlined tokens() would re-run the regex split
    // for every element_at — ~100x slower at sf0.1
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(Text.shingles(col("tk"), NGram)).as("gram"))
    val eval_ = grams.where(col("doc_id") % 11 === 0).select(col("gram")).distinct()
    val train = grams.where(col("doc_id") % 11 =!= 0)
    train.join(eval_, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  val v2Oracle: String = {
    val gram = (0 until NGram).map(o => s"tk[i+$o]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') tk
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_distinct([$gram for i in range(1, len(tk) - ${NGram - 2})])) AS gram
       |  FROM toks WHERE len(tk) >= $NGram),
       |ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 11 = 0)
       |SELECT doc_id, count(DISTINCT gram) AS n_shared_grams
       |FROM grams JOIN ev USING (gram)
       |WHERE doc_id % 11 <> 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Character-trigram profile per language label: top-10 trigrams each —
    * the statistical fingerprint real language-ID models train on.
    */
  def v3CharTrigrams(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.prepare(spark)
    // graft_char_ngrams: codegen'd single loop (the transform/substr HOF
    // form runs interpreted — it was the bench's slowest scan query)
    val grams = Tables.documents(spark, dir)
      .select(col("lang"),
        explode(call_function("graft_char_ngrams", lower(col("text")), lit(3))).as("gram"))
    val counted = grams.groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
    counted
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))))
      .where(col("rn") <= 10)
      .select(col("lang"), col("rn").cast("int").as("rn"), col("gram"), col("cnt"))
      .orderBy("lang", "rn")
  }

  val v3Oracle: String =
    """WITH grams AS (
      |  SELECT lang, unnest([substr(lower(text), i, 3) for i in range(1, length(text) - 1)]) AS gram
      |  FROM documents WHERE length(text) >= 3),
      |counted AS (SELECT lang, gram, count(1) AS cnt FROM grams GROUP BY 1, 2),
      |ranked AS (
      |  SELECT lang, gram, cnt,
      |         CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS INTEGER) AS rn
      |  FROM counted)
      |SELECT lang, rn, gram, cnt FROM ranked WHERE rn <= 10 ORDER BY lang, rn""".stripMargin

  /** Corpus profiling with approximate distinct (HyperLogLog++): the
    * constant-memory cardinality pass a 100 TB profiler runs where exact
    * distinct would shuffle the world. This core form is the scale
    * operator; the gated [[v4ProfileApprox]] wraps it with its own exact
    * verification so the DuckDB oracle can hash-check the error contract.
    */
  def v4ProfileApproxCore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), Text.tokens(col("text")).as("tk"))
      .select(col("source"), col("lang"), explode(col("tk")).as("token"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("token"), 0.02).as("approx_vocab"),
        approx_count_distinct(col("lang")).as("approx_langs"))
      .orderBy("source")

  /** The GATE form of v4: the HLL profile joined against the exact
    * distinct counts, emitting the exact values plus a boolean per sketch
    * asserting the estimate is inside the documented error (10% — 5σ at
    * rsd 0.02 — or ±1, mirroring ApproxOpsSpec). HLL is deterministic for
    * fixed input, so the booleans are stable and DuckDB predicts them all
    * true: the sketch's error CONTRACT is hash-gated even though its raw
    * estimates are engine-specific. The exact-distinct pass is gate-only
    * cost — production profiling runs [[v4ProfileApproxCore]].
    */
  def v4ProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    def ok(approx: Column, exact: Column) =
      abs(approx - exact) <= greatest(lit(1L), (exact.cast("double") * 0.1).cast("long"))
    val exact = Tables.documents(spark, dir)
      .select(col("source"), col("lang"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("exact_vocab"),
        countDistinct(col("lang")).as("exact_langs"))
    exact.join(broadcast(v4ProfileApproxCore(spark, dir)
        .select(col("source"), col("approx_vocab"), col("approx_langs"))), "source")
      .select(col("source"), col("n_tokens"), col("exact_vocab"), col("exact_langs"),
        ok(col("approx_vocab"), col("exact_vocab")).as("vocab_ok"),
        ok(col("approx_langs"), col("exact_langs")).as("langs_ok"))
      .orderBy("source")
  }

  val v4Oracle: String =
    """WITH toks AS (
      |  SELECT source, lang,
      |         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS token
      |  FROM documents)
      |SELECT source, count(1) AS n_tokens, count(DISTINCT token) AS exact_vocab,
      |       count(DISTINCT lang) AS exact_langs, true AS vocab_ok, true AS langs_ok
      |FROM toks GROUP BY source ORDER BY source""".stripMargin

  /** v5: Count-Min-Sketch heavy hitters — the constant-memory frequency
    * profile of a 100 TB key stream (the sketch build is one distributed
    * pass; only the fixed-size sketch reaches the driver, K4-style). For
    * the top-10 exact keys, report exact count next to the CMS estimate.
    * Raw form: estimates are engine-specific, so this one is spec-bounded
    * (ApproxOpsSpec), while the gated [[v5HeavyHitters]] hash-checks the
    * CMS guarantee itself.
    */
  def v5HeavyHittersRaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables.lineitem(spark, dir).select(col("l_partkey"))
    val cms = keys.stat.countMinSketch("l_partkey", 0.001, 0.99, 42)
    val top = keys.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("l_partkey")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top.map { case (k, exact) => (k, exact, cms.estimateCount(k)) }.toSeq
      .toDF("l_partkey", "exact_cnt", "cms_cnt")
  }

  /** The GATE form of v5: keys and exact counts (DuckDB-matchable) plus
    * the CMS guarantee — exact ≤ estimate ≤ exact + ε·N (ε = 0.001,
    * seed-fixed so the estimate is deterministic) — folded into a boolean
    * the oracle predicts true. A sketch regression flips the boolean and
    * fails the hash compare.
    */
  def v5HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = Tables.lineitem(spark, dir).count()
    val epsN = math.ceil(0.001 * n).toLong
    v5HeavyHittersRaw(spark, dir)
      .collect().map { r =>
        val (k, exact, est) = (r.getLong(0), r.getLong(1), r.getLong(2))
        (k, exact, est >= exact && est <= exact + epsN)
      }.toSeq.toDF("l_partkey", "exact_cnt", "cms_ok")
  }

  val v5Oracle: String =
    """SELECT l_partkey, exact_cnt, true AS cms_ok FROM (
      |  SELECT l_partkey, count(1) AS exact_cnt FROM lineitem
      |  GROUP BY 1 ORDER BY exact_cnt DESC, l_partkey LIMIT 10)
      |ORDER BY exact_cnt DESC, l_partkey""".stripMargin

  /** v6: sequence packing — the pretraining batch-prep op: documents are
    * concatenated in a deterministic order and chunked into fixed
    * `PackLen`-token examples; each doc lands at (start_pack, offset),
    * possibly spanning packs.
    *
    * Sharded for scale: the concatenation order is (shard, doc_id) with
    * shard = doc_id % `PackShards`, so the prefix sum runs as
    * `PackShards` independent partitioned windows — no single-partition
    * global window anywhere in the plan. Each shard's global token base
    * is a driver-side cumulative sum over the `PackShards` shard totals
    * (a K4-style tiny fetch), broadcast-joined back. At 100 TB the same
    * plan holds with more shards; the only driver state is one long per
    * shard.
    */
  def v6SequencePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val PackLen = 512L
    val Shards = 8
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard", (col("doc_id") % Shards).cast("long"))
    // per-shard token totals → driver cumsum (Shards rows), rejoined broadcast
    val totals = toks.groupBy("shard").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bases = (0 until Shards).scanLeft(0L)((acc, s) => acc + totals.getOrElse(s.toLong, 0L))
    val baseDf = (0 until Shards).map(s => (s.toLong, bases(s))).toDF("shard", "base")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(baseDf), "shard")
      .withColumn("cum", sum(col("n_tokens")).over(w) + col("base"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $PackLen").as("start_pack"), // div = integral (/, would be double)
        expr(s"(cum - 1) div $PackLen").as("end_pack"),
        ((col("cum") - col("n_tokens")) % PackLen).as("pack_offset"))
      .orderBy("doc_id")
  }

  val v6Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |         doc_id % 8 AS shard
      |  FROM documents),
      |c AS (SELECT doc_id, n_tokens, shard,
      |             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scum
      |      FROM t),
      |b AS (SELECT shard, sum(n_tokens) AS tot FROM t GROUP BY shard),
      |bb AS (SELECT shard, COALESCE(sum(tot) OVER (ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base FROM b),
      |f AS (SELECT doc_id, n_tokens, scum + base AS cum FROM c JOIN bb USING (shard))
      |SELECT doc_id, n_tokens,
      |       CAST((cum - n_tokens) // 512 AS BIGINT) AS start_pack,
      |       CAST((cum - 1) // 512 AS BIGINT) AS end_pack,
      |       CAST((cum - n_tokens) % 512 AS BIGINT) AS pack_offset
      |FROM f ORDER BY doc_id""".stripMargin

  /** v7: per-document keyword extraction — top-3 terms by TF-IDF. The
    * idf uses the rational form N/df (no transcendental: `ln` rounds
    * differently across engines, a plain BIGINT product and ONE IEEE
    * division do not), which is order-equivalent to log-idf for ranking
    * within a document. Shapes: the (doc, tok) count relation, a token
    * df aggregate joined back (vocab-sized — AQE broadcasts it), and a
    * per-doc window for the top-3 — all keyed shuffles, no corpus-wide
    * sort.
    */
  def v7TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs")) // 1-row, K4-style scalar
    val tf = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").crossJoin(nDocs)
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))).cast("long"))
      .where(col("rnk") <= 3)
      .select("doc_id", "rnk", "term", "tf", "df", "score")
      .orderBy("doc_id", "rnk")
  }

  val v7Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) tf FROM t GROUP BY 1, 2),
      |df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) n_docs FROM documents),
      |s AS (
      |  SELECT doc_id, term, CAST(tf AS BIGINT) tf, CAST(df AS BIGINT) df,
      |         CAST(tf * n_docs AS DOUBLE) / df AS score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, term) AS rnk
      |  FROM tf JOIN df USING (term), n)
      |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, score
      |FROM s WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  private val ChunkW = 64 // tokens per chunk
  private val ChunkS = 48 // stride (16-token overlap)

  /** v8: sliding-window document chunking — the RAG / long-context
    * pretraining splitter: 64-token windows at stride 48, each chunk
    * with its coordinates and content fingerprint. Row expansion is a
    * `sequence` + `explode` over chunk indices with `slice` on the
    * MATERIALIZED token array (the m3 frame-sampling shape) — all
    * integer arithmetic, one scan, no shuffle until the final sort; at
    * 100 TB chunking is embarrassingly parallel and the output is
    * written partition-local.
    */
  def v8Chunk(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).cast("long").as("n"))
      .withColumn("nc", // ⌈max(0, n−W)/S⌉ + 1 chunks, in integer arithmetic
        when(col("n") <= ChunkW, lit(1L))
          .otherwise(expr(s"1 + ((n - $ChunkW + ${ChunkS - 1}) div $ChunkS)")))
    toks
      .select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * ChunkS)
      .withColumn("n_tok", least(lit(ChunkW.toLong), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("start_tok") + 1).cast("int"), col("n_tok").cast("int")))).as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")
  }

  val v8Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') tk
       |  FROM documents),
       |n AS (SELECT doc_id, tk, len(tk) AS n FROM t),
       |c AS (
       |  SELECT doc_id, tk, n,
       |         unnest(range(0, CASE WHEN n <= $ChunkW THEN 1
       |                             ELSE 1 + ((n - $ChunkW + ${ChunkS - 1}) // $ChunkS) END)) AS chunk_id
       |  FROM n)
       |SELECT doc_id, chunk_id, chunk_id * $ChunkS AS start_tok,
       |       least($ChunkW, n - chunk_id * $ChunkS) AS n_tok,
       |       md5(array_to_string(tk[chunk_id * $ChunkS + 1 : chunk_id * $ChunkS + least($ChunkW, n - chunk_id * $ChunkS)], ' ')) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** v9: the corpus-curation flagship — the full training-data prep DAG as
    * ONE Catalyst plan: quality scoring (token count + distinct-token
    * ratio, integer cross-multiplied so no float crosses engines) →
    * quality filter → exact dedup keep-first (row_number over the
    * fingerprint) → deterministic hash split → per-(split, lang) corpus
    * stats. The shape a 100 TB curation run actually has: everything up to
    * the dedup is a map-side scan pipeline (filters push down, no
    * shuffle), the dedup window is the ONE big hash shuffle on `fp`, the
    * split is a shuffle-free hash bucket, and the closing agg is tiny.
    * Composing it as one plan (vs materializing between stages) lets
    * Catalyst collapse the projections and AQE pick the shuffle sizes.
    */
  def v9Curate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"), Text.tokens(col("text")).as("tk"))
    val scored = toks.select(col("doc_id"), col("lang"),
        md5(Text.normText(col("text"))).as("fp"),
        size(col("tk")).cast("long").as("n_tok"),
        size(array_distinct(col("tk"))).cast("long").as("n_uniq"))
      .where(col("n_tok") >= 30 && col("n_tok") <= 2000 &&
        col("n_uniq") * 10 >= col("n_tok") * 3)
    val deduped = scored
      .withColumn("rn", row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
      .where(col("rn") === 1)
    val bucket = pmod(Text.md5Long(col("doc_id").cast("string")), lit(100L))
    deduped
      .select(when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").as("split"),
        col("lang"), col("n_tok"), col("doc_id"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"), min("doc_id").as("first_doc"))
      .orderBy("split", "lang")
  }

  val v9Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') tk,
      |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, lang, fp, CAST(len(tk) AS BIGINT) AS n_tok
      |  FROM t
      |  WHERE len(tk) >= 30 AND len(tk) <= 2000
      |    AND len(list_distinct(tk)) * 10 >= len(tk) * 3),
      |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM q),
      |s AS (SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |      FROM d WHERE rn = 1)
      |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
      |       lang, count(1) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       min(doc_id) AS first_doc
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v9_curate" -> (v9Curate _),
    "v1_vocab" -> (v1Vocab _),
    "v2_decontaminate" -> (v2Decontaminate _),
    "v3_char_trigrams" -> (v3CharTrigrams _),
    "v4_profile_approx" -> (v4ProfileApprox _),
    "v5_heavy_hitters" -> (v5HeavyHitters _),
    "v6_sequence_pack" -> (v6SequencePack _),
    "v7_tfidf_keywords" -> (v7TfidfKeywords _),
    "v8_chunk" -> (v8Chunk _))

  val oracles: Map[String, String] = Map(
    "v9_curate" -> v9Oracle,
    "v1_vocab" -> v1Oracle,
    "v2_decontaminate" -> v2Oracle,
    "v3_char_trigrams" -> v3Oracle,
    // v4/v5 gate forms emit exact values + sketch-contract booleans, so
    // the engine-specific HLL/CMS estimates never reach the hash compare
    // but their error contracts do; raw estimates stay spec-bounded in
    // ApproxOpsSpec over the Core/Raw forms
    "v4_profile_approx" -> v4Oracle,
    "v5_heavy_hitters" -> v5Oracle,
    "v6_sequence_pack" -> v6Oracle,
    "v7_tfidf_keywords" -> v7Oracle,
    "v8_chunk" -> v8Oracle)
}
