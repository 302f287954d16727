package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Deterministic sampling and record compaction — training-pipeline
  * staples. `df.sample()` is seed-dependent per partitioning and therefore
  * neither reproducible across engines nor stable under repartition; the
  * scalable reproducible form is HASH sampling: a row is in the sample iff
  * md5(stable key) mod N < rate — embarrassingly parallel, no shuffle at
  * all, identical on any engine and any partition layout.
  */
object SamplingQueries {

  /** n1: 5% Bernoulli hash-sample of lineitem on the (orderkey, linenumber)
    * natural key. Pure map-side filter — the sample of 100 TB costs one
    * scan, no shuffle.
    */
  def n1HashSample(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(pmod(Text.md5Long(concat_ws("_", col("l_orderkey"), col("l_linenumber"))), lit(100L)) < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  val n1Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE ('0x' || substr(md5(l_orderkey || '_' || l_linenumber), 1, 15))::BIGINT % 100 < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** n2: stratified hash-sample — per-stratum rates (10% of URGENT orders,
    * 2% of the rest), reported as per-stratum sampled counts. Rate lives in
    * a CASE expression, so the whole stratified design is still one
    * shuffle-free scan + one count aggregation.
    */
  def n2StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("o_orderpriority") === "1-URGENT", lit(10L)).otherwise(lit(2L))
    Tables.orders(spark, dir)
      .where(pmod(Text.md5Long(col("o_orderkey").cast("string")), lit(100L)) < rate)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"), min("o_orderkey").as("first_key"))
      .orderBy("o_orderpriority")
  }

  val n2Oracle: String =
    """SELECT o_orderpriority, count(1) AS n_sampled, min(o_orderkey) AS first_key
      |FROM orders
      |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 100
      |      < (CASE WHEN o_orderpriority = '1-URGENT' THEN 10 ELSE 2 END)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** n3: latest-record-per-key compaction (the upsert/changelog resolution
    * step: many versions per key in, exactly one — the newest — out).
    * One shuffle on the key; the deterministic tiebreak (ts, event_id)
    * makes the survivor unique.
    */
  def n3LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  val n3Oracle: String =
    """SELECT user_id, event_id, ts, event_type, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** n4: token-budget dataset mixing — the corpus-weighting step of a
    * pretraining mix: each source contributes documents (in a
    * deterministic md5 shuffle order) until its token budget is met
    * (greedy, the crossing document included). One window per source —
    * partition-parallel across sources, no global pass.
    */
  def n4TokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    val budget = when(expr("CAST(substring(source, 4) AS INT)") % 2 === 0, lit(3000L))
      .otherwise(lit(1000L))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
        Text.md5Long(col("doc_id").cast("string")).as("h"),
        budget.as("budget"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .where(col("cum") - col("n_tokens") < col("budget")) // greedy incl. crossing doc
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .orderBy("source")
  }

  val n4Oracle: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
      |         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 3000 ELSE 1000 END AS budget
      |  FROM documents),
      |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM t)
      |SELECT source, count(1) AS docs_kept, CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
      |FROM c WHERE cum - n_tokens < budget
      |GROUP BY source ORDER BY source""".stripMargin

  /** n5: three-way train/val/test split by document hash — reproducible on
    * any engine and stable under corpus growth (a doc's split never
    * changes when other docs arrive: the hash depends only on its id).
    */
  def n5TrainValTest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    val bucket = pmod(Text.md5Long(col("doc_id").cast("string")), lit(100L))
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    Tables.documents(spark, dir)
      .select(split.as("split"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"))
      .orderBy("split")
  }

  val n5Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |  FROM documents)
      |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |       count(1) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(doc_id) AS first_doc
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** n6: exact-size uniform sample without replacement — bottom-k by
    * hash (the classic bottom-k / KMV sketch selection rule): the 500
    * rows with the smallest md5 of the key ARE a uniform 500-sample, and
    * the same 500 on every engine and partitioning. Compiles to
    * TakeOrderedAndProject: each partition keeps a local 500-heap and
    * the driver merges heaps — no global sort, no shuffle of the
    * non-sample, which is why bottom-k is THE fixed-size sampler at
    * 100 TB (n1's Bernoulli form gives a random-sized sample; this one
    * is exact-k).
    */
  def n6BottomKSample(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        md5(concat(lit("n6:"), col("o_orderkey").cast("string"))).as("h"))
      .orderBy("h")
      .limit(500)

  val n6Oracle: String =
    """SELECT o_orderkey, md5('n6:' || CAST(o_orderkey AS VARCHAR)) AS h
      |FROM orders ORDER BY h LIMIT 500""".stripMargin

  /** n7: deterministic training-shard shuffle — the "globally shuffle the
    * corpus into N training shards" step every pretraining run needs. A
    * global ORDER BY random() is a total sort (and not reproducible); the
    * scalable reproducible form is hash-shard + shard-local sort: shard =
    * md5(salt_s, id) mod N routes each doc (one hash shuffle, N reducers),
    * pos = rank of md5(salt_o, id) within the shard (shard-LOCAL sort, no
    * global ordering pass). Independent salts make shard routing and
    * within-shard order independent uniform draws; a training reader
    * streaming shard files in pos order sees a reproducible pseudorandom
    * permutation. At 100 TB: raise N so each shard sorts in memory; the
    * plan shape (scan → hash shuffle → per-partition sort) is unchanged.
    */
  def n7ShardShuffle(spark: SparkSession, dir: String): DataFrame = {
    val nShards = 8L
    val w = Window.partitionBy("shard").orderBy(col("oh"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(Text.md5Long(concat(lit("n7s:"), col("doc_id").cast("string"))), lit(nShards))
          .cast("int").as("shard"),
        Text.md5Long(concat(lit("n7o:"), col("doc_id").cast("string"))).as("oh"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  val n7Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5('n7s:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT) AS shard,
      |         ('0x' || substr(md5('n7o:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS oh
      |  FROM documents)
      |SELECT doc_id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY oh, doc_id) AS BIGINT) AS pos
      |FROM t ORDER BY shard, pos""".stripMargin

  /** n8: temperature-flattened source mixing (α = 0.5) — the multilingual /
    * source-balance staple: sample source s at rate ∝ tokens_s^(α−1), so
    * kept tokens ∝ sqrt(tokens_s) — big sources are damped, small ones
    * surface. Rates are materialized as integer parts-per-million computed
    * with ONLY correctly-rounded IEEE double ops (long/long division, sqrt,
    * ×1e6, floor) — bit-identical on any engine, so the md5-ppm membership
    * test is reproducible like n1/n5. One token-count aggregation (tiny,
    * broadcast back) + one shuffle-free filtered scan: the 100 TB cost is
    * one pass.
    */
  def n8TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    val bySrc = tok.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val tmin = bySrc.agg(min("src_tokens").as("min_tokens"))
    val rates = bySrc.crossJoin(broadcast(tmin)) // 1-row scalar, benign
      .select(col("source"),
        floor(lit(1000000.0) * sqrt(col("min_tokens") / col("src_tokens")))
          .cast("long").as("rate_ppm"))
    tok.join(broadcast(rates), Seq("source"))
      .where(pmod(Text.md5Long(concat(lit("n8:"), col("doc_id").cast("string"))),
        lit(1000000L)) < col("rate_ppm"))
      .groupBy("source", "rate_ppm")
      .agg(count(lit(1)).as("docs_kept"), sum("n_tokens").as("tokens_kept"))
      .orderBy("source")
  }

  val n8Oracle: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens FROM t GROUP BY 1),
      |r AS (SELECT source,
      |             CAST(floor(1000000.0 * sqrt((SELECT min(src_tokens) FROM s) / src_tokens)) AS BIGINT) AS rate_ppm
      |      FROM s)
      |SELECT t.source, r.rate_ppm, count(1) AS docs_kept, CAST(sum(t.n_tokens) AS BIGINT) AS tokens_kept
      |FROM t JOIN r ON t.source = r.source
      |WHERE ('0x' || substr(md5('n8:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 < r.rate_ppm
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** n9: sequence packing — the pretraining step that concatenates short
    * documents into fixed token-budget training sequences (bins) so
    * context windows aren't mostly padding. Greedy next-fit packing is
    * inherently SEQUENTIAL (each bin decision depends on the running
    * fill), so the scalable form is shard-parallel: route each doc to a
    * packer shard by hash (one shuffle, the only one), then fold the
    * shard's (doc_id, n_tokens) list in deterministic doc_id order with
    * one `aggregate` HOF — open a new bin when the budget would overflow;
    * an oversized doc gets a bin alone. Parallelism is the shard count:
    * at 100 TB raise S until a shard's doc METADATA (16 bytes/doc — the
    * texts never move through the fold) fits an executor; the packed
    * output joins back to texts by doc_id if the trainer needs bytes
    * co-located. The oracle replays the same greedy fold as a recursive
    * CTE over the same order.
    */
  /** The packing fold as ONE LINEAR pass per shard: hash-route whole
    * shards to partitions, sort within partitions by (shard, doc_id),
    * and stream the greedy recurrence over the iterator, resetting (or
    * seeding, for the incremental form) the state at each shard
    * boundary. The first n9 form built the assignment array inside an
    * `aggregate` HOF via `concat(acc.out, array(…))` — each step copies
    * the whole accumulator, so a 62k-doc shard did ~2e9 element copies
    * and the 100× probe measured a 492× cliff (151 s). mapPartitions is
    * the genuinely-sequential-per-shard case the HOF can't express
    * linearly; the probe re-measured the linear pass at data-ratio
    * scaling. `seed` carries the incremental form's per-shard
    * (open bin, fill) start state (joined in as columns).
    */
  private[graft] def packLinear(docs: DataFrame, w: Long, nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("shard").cast("int"),
        col("n_tokens").cast("long"), col("bin0").cast("long"), col("used0").cast("long"))
      .as[(Long, Int, Long, Long, Long)]
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        var cur = Int.MinValue
        var bin = 0L
        var used = 0L
        it.map { case (id, sh, n, bin0, used0) =>
          if (sh != cur) { cur = sh; bin = bin0; used = used0 }
          if (used + n <= w) used += n else { bin += 1; used = n }
          (id, sh, bin, n)
        }
      }
      .toDF("doc_id", "shard", "bin", "n_tokens")
  }

  def n9SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val W = 256L // token budget per packed sequence
    val S = 8L
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"),
      pmod(Text.md5Long(concat(lit("n9s:"), col("doc_id").cast("string"))), lit(S))
        .cast("int").as("shard"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    packLinear(
      docs.withColumn("bin0", lit(0L)).withColumn("used0", lit(W + 1)),
      W, S.toInt)
      .orderBy("shard", "bin", "doc_id")
  }

  val n9Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5('n9s:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT) AS shard,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |         row_number() OVER (PARTITION BY CAST(('0x' || substr(md5('n9s:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT)
      |                            ORDER BY doc_id) AS rn
      |  FROM documents),
      |rec AS (
      |  SELECT shard, rn, doc_id, n_tokens,
      |         CAST(1 AS BIGINT) AS bin,
      |         n_tokens AS used
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
      |         CASE WHEN r.used + t.n_tokens <= 256 THEN r.bin ELSE r.bin + 1 END,
      |         CASE WHEN r.used + t.n_tokens <= 256 THEN r.used + t.n_tokens ELSE t.n_tokens END
      |  FROM rec r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1)
      |SELECT doc_id, shard, bin, n_tokens FROM rec
      |ORDER BY shard, bin, doc_id""".stripMargin

  /** n10: INCREMENTAL sequence packing — the production form of n9. A
    * crawl increment must not trigger a re-pack of the corpus: per shard,
    * only the final `(open bin, fill)` state of the base pack is kept
    * (two longs per shard — the assignments themselves never reload),
    * and the increment's docs fold on from that state, possibly topping
    * up the base's last open bin. Base = 90% of docs by membership hash,
    * increment = the other 10%; output is the increment's assignments
    * only. The oracle replays ONE greedy fold over base-then-increment
    * order and emits the increment rows — proving the two-phase fold
    * equals the from-scratch fold, which is exactly the invariant that
    * makes the incremental path safe at 100 TB.
    */
  def n10IncrementalPack(spark: SparkSession, dir: String): DataFrame = {
    val W = 256L
    val S = 8L
    val all = Tables.documents(spark, dir).select(
      col("doc_id"),
      pmod(Text.md5Long(concat(lit("n9s:"), col("doc_id").cast("string"))), lit(S))
        .cast("int").as("shard"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
      (pmod(Text.md5Long(concat(lit("n10i:"), col("doc_id").cast("string"))), lit(10L)) === 0)
        .as("is_inc"))
    // base pack state — (open bin, fill) per shard, recovered from the
    // linear pack's OUTPUT: the open bin is the max bin id, and its fill
    // is the token sum of the docs packed into it (the fold's `used` is
    // exactly that running sum). Nothing quadratic, nothing collected.
    val packedBase = packLinear(
      all.where(!col("is_inc"))
        .withColumn("bin0", lit(0L)).withColumn("used0", lit(W + 1)),
      W, S.toInt)
    val lastBin = packedBase.groupBy("shard").agg(max("bin").as("bin0"))
    val baseState = packedBase.join(lastBin, "shard")
      .where(col("bin") === col("bin0"))
      .groupBy("shard", "bin0").agg(sum("n_tokens").as("used0"))
    // increment pack: the same LINEAR fold seeded from the base state (a
    // shard with no base docs starts fresh); the base state rides in as
    // broadcast-joined columns
    packLinear(
      all.where(col("is_inc"))
        .join(broadcast(baseState), Seq("shard"), "left")
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          coalesce(col("bin0"), lit(0L)).as("bin0"),
          coalesce(col("used0"), lit(W + 1)).as("used0")),
      W, S.toInt)
      .orderBy("shard", "bin", "doc_id")
  }

  val n10Oracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5('n9s:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT) AS shard,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |         (('0x' || substr(md5('n10i:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0) AS is_inc
      |  FROM documents),
      |o AS (
      |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY is_inc, doc_id) AS rn
      |  FROM t),
      |rec AS (
      |  SELECT shard, rn, doc_id, n_tokens, is_inc,
      |         CAST(1 AS BIGINT) AS bin, n_tokens AS used
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.shard, o.rn, o.doc_id, o.n_tokens, o.is_inc,
      |         CASE WHEN r.used + o.n_tokens <= 256 THEN r.bin ELSE r.bin + 1 END,
      |         CASE WHEN r.used + o.n_tokens <= 256 THEN r.used + o.n_tokens ELSE o.n_tokens END
      |  FROM rec r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1)
      |SELECT doc_id, shard, bin, n_tokens FROM rec WHERE is_inc
      |ORDER BY shard, bin, doc_id""".stripMargin

  /** n11: the training-data MANIFEST — the end-to-end composition a
    * pretraining prep run executes: exact-dedup survivors (d1's min-id
    * rule) → quality gate (token floor) → temperature-flattened source
    * sampling (n8's α=0.5 integer-ppm rates, computed over the
    * deduped+gated corpus) → n5-style hash split; reported per (split,
    * source) with doc/token totals. Every stage is a hash filter or one
    * aggregation: the whole manifest of a 100 TB corpus costs the dedup
    * shuffle, a tiny per-source rollup broadcast back, and the final
    * rollup — no stage materializes text beyond the first scan.
    */
  def n11TrainingManifest(spark: SparkSession, dir: String): DataFrame = {
    val fpw = Window.partitionBy(md5(Text.normText(col("text")))).orderBy("doc_id")
    val surv = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
        row_number().over(fpw).as("rn"))
      .where(col("rn") === 1 && col("n_tokens") >= 20)
      .drop("rn")
    val bySrc = surv.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val tmin = bySrc.agg(min("src_tokens").as("min_tokens"))
    val rates = bySrc.crossJoin(broadcast(tmin)) // 1-row scalar, benign
      .select(col("source"),
        floor(lit(1000000.0) * sqrt(col("min_tokens") / col("src_tokens")))
          .cast("long").as("rate_ppm"))
    val bucket = pmod(Text.md5Long(col("doc_id").cast("string")), lit(100L))
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    surv.join(broadcast(rates), Seq("source"))
      .where(pmod(Text.md5Long(concat(lit("n11:"), col("doc_id").cast("string"))),
        lit(1000000L)) < col("rate_ppm"))
      .select(split.as("split"), col("source"), col("doc_id"), col("n_tokens"), col("rate_ppm"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"), max("rate_ppm").as("rate_ppm"))
      .orderBy("split", "source")
  }

  val n11Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
      |         row_number() OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |                            ORDER BY doc_id) AS rn
      |  FROM documents),
      |surv AS (SELECT * FROM d WHERE rn = 1 AND n_tokens >= 20),
      |s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens FROM surv GROUP BY 1),
      |r AS (SELECT source,
      |             CAST(floor(1000000.0 * sqrt((SELECT min(src_tokens) FROM s) / src_tokens)) AS BIGINT) AS rate_ppm
      |      FROM s),
      |kept AS (
      |  SELECT surv.doc_id, surv.source, surv.n_tokens, r.rate_ppm,
      |         CASE WHEN ('0x' || substr(md5(CAST(surv.doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
      |              WHEN ('0x' || substr(md5(CAST(surv.doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM surv JOIN r ON surv.source = r.source
      |  WHERE ('0x' || substr(md5('n11:' || CAST(surv.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 < r.rate_ppm)
      |SELECT split, source, count(1) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       min(doc_id) AS first_doc, max(rate_ppm) AS rate_ppm
      |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** n12: n9's greedy sequence packing with the budget in LEARNED BPE
    * tokens instead of whitespace tokens — the form a real training
    * pipeline runs (whitespace counts mis-state budgets 1.3–1.7× by
    * language; here the corpus packs into materially different bins —
    * `n_ws` rides along so the delta per doc is visible in the gated
    * output). Same one-Exchange-per-shard fold as n9; the only addition
    * is the broadcast type→subword-count join from
    * [[graft.operators.Bpe]]. The oracle replays BPE training end-to-end
    * (t14's CTEs), then the same recursive greedy fold as n9.
    */
  def n12BpePack(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val W = 256L
    val S = 8L
    val model = Bpe.train(spark, dir, Bpe.EncodeRounds)
    val toks = Bpe.docTokens(spark, dir, model)
    val docs = toks.select(col("doc_id"),
      pmod(Text.md5Long(concat(lit("n9s:"), col("doc_id").cast("string"))), lit(S))
        .cast("int").as("shard"),
      col("n_bpe").as("n_tokens"))
    packLinear(docs.withColumn("bin0", lit(0L)).withColumn("used0", lit(W + 1)), W, S.toInt)
      .withColumnRenamed("n_tokens", "n_bpe")
      .join(toks.select(col("doc_id"), col("n_ws")), "doc_id")
      .select("doc_id", "shard", "bin", "n_bpe", "n_ws")
      .orderBy("shard", "bin", "doc_id")
  }

  val n12Oracle: String = {
    val bpe = graft.operators.Bpe.oracleCtes(graft.operators.Bpe.EncodeRounds).stripPrefix("WITH ")
    s"""WITH RECURSIVE $bpe,
       |dt AS MATERIALIZED (
       |  SELECT dw.doc_id,
       |         CAST(('0x' || substr(md5('n9s:' || CAST(dw.doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT) AS shard,
       |         CAST(sum(coalesce(tt.n_sym, length(dw.w))) AS BIGINT) AS n_tokens,
       |         CAST(count(*) AS BIGINT) AS n_ws
       |  FROM dw LEFT JOIN tt USING (w) GROUP BY 1),
       |t AS MATERIALIZED (SELECT doc_id, shard, n_tokens, n_ws,
       |       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM dt),
       |rec AS (
       |  SELECT shard, rn, doc_id, n_tokens, n_ws, CAST(1 AS BIGINT) AS bin, n_tokens AS used
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.shard, t.rn, t.doc_id, t.n_tokens, t.n_ws,
       |         CASE WHEN r.used + t.n_tokens <= 256 THEN r.bin ELSE r.bin + 1 END,
       |         CASE WHEN r.used + t.n_tokens <= 256 THEN r.used + t.n_tokens ELSE t.n_tokens END
       |  FROM rec r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1)
       |SELECT doc_id, shard, bin, n_tokens AS n_bpe, n_ws FROM rec
       |ORDER BY shard, bin, doc_id""".stripMargin
  }

  /** n13: n12's greedy packing with the budget in BYTE-LEVEL BPE tokens
    * (t16's tokenizer) — the budget a GPT-2-lineage training stack
    * actually fills sequences against. Word-level budgets (n12) drift
    * from byte-level ones wherever pretokenization splits differently
    * than whitespace (space-attachment, punctuation, digits); packing
    * against the wrong count under- or over-fills every bin. Same
    * one-Exchange-per-shard fold as n9/n12, same shard hash, wider
    * window (byte tokens run ~1.5× word tokens on this corpus).
    */
  def n13ByteBpePack(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val W = 512L
    val S = 8L
    val model = Bpe.trainBytes(spark, dir)
    val toks = Bpe.docByteTokens(spark, dir, model)
    val docs = toks.select(col("doc_id"),
      pmod(Text.md5Long(concat(lit("n9s:"), col("doc_id").cast("string"))), lit(S))
        .cast("int").as("shard"),
      col("n_bbpe").as("n_tokens"))
    packLinear(docs.withColumn("bin0", lit(0L)).withColumn("used0", lit(W + 1)), W, S.toInt)
      .withColumnRenamed("n_tokens", "n_bbpe")
      .join(toks.select(col("doc_id"), col("n_pre")), "doc_id")
      .select("doc_id", "shard", "bin", "n_bbpe", "n_pre")
      .orderBy("shard", "bin", "doc_id")
  }

  val n13Oracle: String = {
    val bpe = graft.operators.Bpe.byteOracleCtes().stripPrefix("WITH ")
    s"""WITH RECURSIVE $bpe,
       |dt AS MATERIALIZED (
       |  SELECT dw.doc_id,
       |         CAST(('0x' || substr(md5('n9s:' || CAST(dw.doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT) AS shard,
       |         CAST(sum(coalesce(tt.n_sym, octet_length(encode(dw.w)))) AS BIGINT) AS n_tokens,
       |         CAST(count(*) AS BIGINT) AS n_pre
       |  FROM dw LEFT JOIN tt USING (w) GROUP BY 1),
       |t AS MATERIALIZED (SELECT doc_id, shard, n_tokens, n_pre,
       |       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM dt),
       |rec AS (
       |  SELECT shard, rn, doc_id, n_tokens, n_pre, CAST(1 AS BIGINT) AS bin, n_tokens AS used
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.shard, t.rn, t.doc_id, t.n_tokens, t.n_pre,
       |         CASE WHEN r.used + t.n_tokens <= 512 THEN r.bin ELSE r.bin + 1 END,
       |         CASE WHEN r.used + t.n_tokens <= 512 THEN r.used + t.n_tokens ELSE t.n_tokens END
       |  FROM rec r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1)
       |SELECT doc_id, shard, bin, n_tokens AS n_bbpe, n_pre FROM rec
       |ORDER BY shard, bin, doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n13_byte_bpe_pack" -> (n13ByteBpePack _),
    "n12_bpe_pack" -> (n12BpePack _),
    "n6_bottomk_sample" -> (n6BottomKSample _),
    "n7_shard_shuffle" -> (n7ShardShuffle _),
    "n8_temperature_mix" -> (n8TemperatureMix _),
    "n9_sequence_pack" -> (n9SequencePack _),
    "n10_incremental_pack" -> (n10IncrementalPack _),
    "n11_training_manifest" -> (n11TrainingManifest _),
    "n1_hash_sample" -> (n1HashSample _),
    "n2_stratified_sample" -> (n2StratifiedSample _),
    "n3_latest_per_key" -> (n3LatestPerKey _),
    "n4_token_budget_mix" -> (n4TokenBudgetMix _),
    "n5_train_val_test" -> (n5TrainValTest _))

  val oracles: Map[String, String] = Map(
    "n13_byte_bpe_pack" -> n13Oracle,
    "n12_bpe_pack" -> n12Oracle,
    "n6_bottomk_sample" -> n6Oracle,
    "n7_shard_shuffle" -> n7Oracle,
    "n8_temperature_mix" -> n8Oracle,
    "n9_sequence_pack" -> n9Oracle,
    "n10_incremental_pack" -> n10Oracle,
    "n11_training_manifest" -> n11Oracle,
    "n1_hash_sample" -> n1Oracle,
    "n2_stratified_sample" -> n2Oracle,
    "n3_latest_per_key" -> n3Oracle,
    "n4_token_budget_mix" -> n4Oracle,
    "n5_train_val_test" -> n5Oracle)
}
