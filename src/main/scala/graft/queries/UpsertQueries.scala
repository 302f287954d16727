package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ArgMaxLong, ArgValue}
import graft.operators.Upsert
import graft.sources.Tables

/** User-defined aggregation (typed Aggregator UDAF) and MERGE/upsert —
  * API surfaces SURVEY.md §2.11 marks absent from the reference, supplied
  * as library primitives with cross-engine oracles.
  */
object UpsertQueries {

  /** u1: per customer, the order id carrying their maximum spend — the
    * typed ArgMaxLong Aggregator through groupByKey (partial-aggregates
    * map-side like a built-in; ties break to the smallest order id so the
    * oracle's row_number formulation agrees exactly).
    */
  def u1ArgmaxAggregator(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new ArgMaxLong().toColumn
    Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_orderkey").as("arg"),
        round(col("o_totalprice") * 100).cast("long").as("value"))
      .as[(Long, Long, Long)]
      .map { case (c, a, v) => (c, ArgValue(a, v)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("best"))
      .select(col("key").as("o_custkey"),
        col("best.arg").as("best_orderkey"),
        col("best.value").as("best_cents"))
      .orderBy("o_custkey")
  }

  val u1Oracle: String =
    """SELECT o_custkey, best_orderkey, best_cents
      |FROM (SELECT o_custkey, o_orderkey AS best_orderkey,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS best_cents,
      |             row_number() OVER (PARTITION BY o_custkey
      |                                ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
      |                                         o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** u2: CDC merge — every 7th customer gets a balance bump (update) and a
    * shifted-id copy arrives as an insert; Upsert must replace the former,
    * append the latter, and carry everything else. Balances in cents so
    * the +1000.00 update is exact.
    */
  def u2Upsert(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val changed = cust.where(col("c_custkey") % 7 === 0)
      .withColumn("bal_cents", col("bal_cents") + 100000L)
    val inserted = cust.where(col("c_custkey") % 13 === 0)
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
    Upsert(cust, changed.unionByName(inserted), Seq("c_custkey"))
      .orderBy("c_custkey")
  }

  val u2Oracle: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer),
      |updates AS (
      |  SELECT c_custkey, c_name, c_nationkey, bal_cents + 100000 AS bal_cents
      |  FROM cust WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name, c_nationkey, bal_cents
      |  FROM cust WHERE c_custkey % 13 = 0)
      |SELECT c_custkey, c_name, c_nationkey, CAST(bal_cents AS BIGINT) AS bal_cents FROM updates
      |UNION ALL
      |SELECT c.c_custkey, c.c_name, c.c_nationkey, CAST(c.bal_cents AS BIGINT) AS bal_cents
      |FROM cust c ANTI JOIN updates u ON c.c_custkey = u.c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** u3: incremental aggregate maintenance
    * ([[graft.operators.IncrementalAgg]]) — a per-priority (count, cents)
    * aggregate built over a base subset is refreshed from a changelog of
    * inserts (weight +1) and retractions (weight −1) WITHOUT re-reading
    * the base: delta pre-agg (one small key shuffle) + full-outer merge
    * with the state. The oracle aggregates the surviving rows directly,
    * so the hash-match proves refresh(state, Δ) ≡ full(base ⊎ Δ). Cents
    * stay integral end-to-end (the f2/x1 exactness rule).
    */
  def u3IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAgg
    import graft.operators.IncrementalAgg.SumSpec
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"), col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val sums = Seq(SumSpec("sum_cents", col("cents")))
    val base = o.where(col("o_orderkey") % 4 =!= 0)
    val state = IncrementalAgg.full(base, Seq("prio"), lit(1L), sums)
    val delta = o.where(col("o_orderkey") % 4 === 0).withColumn("w", lit(1L))
      .unionByName(base.where(col("o_orderkey") % 7 === 0).withColumn("w", lit(-1L)))
    IncrementalAgg.refresh(state, delta, Seq("prio"), col("w"), sums)
      .select("prio", "cnt", "sum_cents") // drop the internal _nn_ state column
      .orderBy("prio")
  }

  val u3Oracle: String =
    """WITH t AS (
      |  SELECT o_orderpriority AS prio, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 4 = 0 OR o_orderkey % 7 <> 0)
      |SELECT prio, count(1) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** u4: incremental MIN/MAX maintenance
    * ([[graft.operators.IncrementalAgg.refreshWithExtrema]]) — the u3
    * changelog shape, now also carrying per-priority min/max cents.
    * Extrema are not retractable from additive state, so
    * retraction-touched keys are exactly re-aggregated from base ⊎ Δ
    * restricted to those keys (one semi-join), while insert-only keys
    * merge with least/greatest and never reread base. The oracle
    * aggregates the surviving rows directly, so the hash-match proves
    * the two-path repair ≡ full recompute — including the "retract the
    * current minimum" edge that naive min-merge gets wrong.
    */
  def u4IncrementalExtrema(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAgg
    import graft.operators.IncrementalAgg.{ExtremaSpec, SumSpec}
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"), col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val sums = Seq(SumSpec("sum_cents", col("cents")))
    val ext = Seq(ExtremaSpec("cents", col("cents")))
    val base = o.where(col("o_orderkey") % 4 =!= 0)
    val state = IncrementalAgg.fullWithExtrema(base, Seq("prio"), lit(1L), sums, ext)
    val delta = o.where(col("o_orderkey") % 4 === 0).withColumn("w", lit(1L))
      .unionByName(base.where(col("o_orderkey") % 7 === 0).withColumn("w", lit(-1L)))
    IncrementalAgg.refreshWithExtrema(state, delta, base, Seq("prio"), col("w"), sums, ext)
      .select("prio", "cnt", "sum_cents", "min_cents", "max_cents")
      .orderBy("prio")
  }

  val u4Oracle: String =
    """WITH t AS (
      |  SELECT o_orderpriority AS prio, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 4 = 0 OR o_orderkey % 7 <> 0)
      |SELECT prio, count(1) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       CAST(min(cents) AS BIGINT) AS min_cents, CAST(max(cents) AS BIGINT) AS max_cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** u5: incremental TOP-K maintenance
    * ([[graft.operators.IncrementalAgg.refreshTopK]]) — the u3/u4
    * changelog shape, now maintaining each priority's top-3 orders by
    * cents. Like extrema (k=1), top-k is not retractable from k rows of
    * state, so retraction-touched keys re-rank exactly over base ⊎ Δ
    * restricted by one semi-join while insert-only keys re-rank
    * state ∪ inserts without base access. The oracle ranks the surviving
    * rows directly, so the hash-match proves the two-path repair ≡ full
    * recompute — including "retract the current leader", where naive
    * state-merge would publish a stale rank 1.
    */
  def u5IncrementalTopK(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAgg
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"), col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val base = o.where(col("o_orderkey") % 4 =!= 0)
    val state = IncrementalAgg.fullTopK(base, Seq("prio"), lit(1L),
      col("o_orderkey"), col("cents"), k = 3)
    val delta = o.where(col("o_orderkey") % 4 === 0).withColumn("w", lit(1L))
      .unionByName(base.where(col("o_orderkey") % 7 === 0).withColumn("w", lit(-1L)))
    IncrementalAgg.refreshTopK(state, delta, base, Seq("prio"), col("w"),
      col("o_orderkey"), col("cents"), k = 3)
      .select(col("prio"), col("rank").cast("long").as("rank"),
        col("id").as("o_orderkey"), col("value").as("cents"))
      .orderBy("prio", "rank")
  }

  val u5Oracle: String =
    """WITH t AS (
      |  SELECT o_orderpriority AS prio, o_orderkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 4 = 0 OR o_orderkey % 7 <> 0)
      |SELECT prio, rank, o_orderkey, cents FROM (
      |  SELECT prio, o_orderkey, cents,
      |         row_number() OVER (PARTITION BY prio ORDER BY cents DESC, o_orderkey) AS rank
      |  FROM t)
      |WHERE rank <= 3 ORDER BY prio, rank""".stripMargin

  /** u6: incremental DISTINCT-count maintenance
    * ([[graft.operators.IncrementalAgg.refreshDistinct]]) — the u3/u4
    * changelog shape, now maintaining distinct customers per priority.
    * A distinct count is not retractable from the count alone (removing
    * one of a customer's two orders must not decrement it); the
    * presence index (surviving (prio, custkey) multiplicities) makes the
    * refresh exact in O(Δ + index), and the summary adjusts by
    * zero-crossings instead of recounting. The oracle counts DISTINCT
    * over the surviving rows directly, so the hash-match proves
    * index-merge ≡ full recompute — including the both-copies /
    * one-copy retraction edge (o_orderkey % 7 retracts single rows of
    * multi-order customers).
    */
  def u6IncrementalDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAgg
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"), col("o_orderkey"), col("o_custkey"))
    val base = o.where(col("o_orderkey") % 4 =!= 0)
    val index = IncrementalAgg.fullDistinctIndex(base, Seq("prio"), lit(1L), col("o_custkey"))
    val summary = IncrementalAgg.distinctSummary(index, Seq("prio"))
    val delta = o.where(col("o_orderkey") % 4 === 0).withColumn("w", lit(1L))
      .unionByName(base.where(col("o_orderkey") % 7 === 0).withColumn("w", lit(-1L)))
    val (_, refreshed) = IncrementalAgg.refreshDistinct(
      index, summary, delta, Seq("prio"), col("w"), col("o_custkey"))
    refreshed.orderBy("prio")
  }

  val u6Oracle: String =
    """WITH t AS (
      |  SELECT o_orderpriority AS prio, o_custkey
      |  FROM orders WHERE o_orderkey % 4 = 0 OR o_orderkey % 7 <> 0)
      |SELECT prio, count(DISTINCT o_custkey) AS ndv
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** u7: incremental JOIN-view maintenance
    * ([[graft.operators.IncrementalJoin]]) — a materialized
    * customer ⋈ orders view refreshed from changelogs of BOTH sides at
    * once: order inserts and retractions join the persisted customer
    * index, and retracting a customer cascades its entire order fan-out
    * out of the view via the ΔA ⋈ B term — no base re-join anywhere.
    * The oracle inner-joins the surviving rows directly, so the
    * hash-match proves the three-term delta identity ≡ full recompute.
    */
  def u7IncrementalJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalJoin
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ords = Tables.orders(spark, dir).select(
      col("o_custkey").as("c_custkey"), col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val baseA = cust.withColumn("w", lit(1L))
    val baseB = ords.where(col("o_orderkey") % 4 =!= 0).withColumn("w", lit(1L))
    val state = IncrementalJoin.full(baseA, baseB, Seq("c_custkey"))
    val dA = cust.where(col("c_custkey") % 50 === 3).withColumn("w", lit(-1L))
    val dB = ords.where(col("o_orderkey") % 4 === 0).withColumn("w", lit(1L))
      .unionByName(ords.where(col("o_orderkey") % 4 =!= 0 && col("o_orderkey") % 7 === 0)
        .withColumn("w", lit(-1L)))
    IncrementalJoin.refresh(state, dA, dB, Seq("c_custkey")).view
      .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"), col("cents"), col("m"))
      .orderBy("o_orderkey")
  }

  val u7Oracle: String =
    """WITH a AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 50 <> 3),
      |b AS (
      |  SELECT o_custkey AS c_custkey, o_orderkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 4 = 0 OR o_orderkey % 7 <> 0)
      |SELECT c_custkey, c_mktsegment, o_orderkey, cents, CAST(1 AS BIGINT) AS m
      |FROM a JOIN b USING (c_custkey) ORDER BY o_orderkey""".stripMargin

  /** u8: type-2 SCD history from the order-priority changelog — each
    * customer's `o_orderpriority` stream becomes versioned dimension rows
    * via [[graft.operators.Scd2]]. All three passes (last-event-per-day,
    * no-op collapse, validity stitch) share one Exchange+Sort on
    * `o_custkey`; the oracle replays the same three window passes as
    * nested CTEs, proving collapse semantics (not just final attrs)
    * match.
    */
  def u8Scd2History(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scd2
    val ev = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority").as("priority"), col("o_orderkey"))
    Scd2.build(ev, Seq("o_custkey"), "priority", "o_orderdate", "o_orderkey")
      .orderBy("o_custkey", "valid_from")
  }

  val u8Oracle: String =
    """WITH ev AS (
      |  SELECT o_custkey, o_orderdate, o_orderpriority AS priority, o_orderkey
      |  FROM orders),
      |p1 AS (
      |  SELECT *, lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nts
      |  FROM ev),
      |p1k AS (SELECT * FROM p1 WHERE nts IS NULL OR nts <> o_orderdate),
      |p2 AS (
      |  SELECT *, lag(priority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pattr
      |  FROM p1k),
      |p2k AS (SELECT * FROM p2 WHERE pattr IS NULL OR pattr <> priority)
      |SELECT o_custkey, priority, o_orderdate AS valid_from,
      |       lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
      |       lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
      |FROM p2k ORDER BY o_custkey, valid_from""".stripMargin

  /** u9: CDC apply — compacting a change-data-capture feed (op ∈ I/U/D,
    * per-key monotone sequence numbers) onto a base snapshot, under the
    * delivery guarantees a real log gives you: AT-LEAST-ONCE (rows may
    * arrive duplicated — every 3rd change is delivered twice here) and
    * OUT OF ORDER (the apply must not depend on input order, and doesn't:
    * redeliveries collapse under `distinct`, then ONE key-partitioned
    * `max_by(struct(op, value), seq)` picks each key's latest op — the
    * op-log order never matters). A winning D drops the key (including
    * keys the base never had: D-after-I both in-feed); a winning U/I
    * sets the value; keys without changes pass through via the full
    * outer join. This is the u2 upsert completed to full CRUD — the
    * Debezium→table compaction shape — and it is one distinct + one
    * partial-aggregable groupBy + one join, all on the key, so it
    * parallelizes like any keyed aggregation at any feed size.
    *
    * The feed is derived deterministically from the customer table:
    * %5 → U (+111 cents, seq 1), %7 → D (seq 2), %7∧%2 → re-insert I
    * (seq 3, balance 55500) — so some keys see U then D (deleted), some
    * U,D,I (resurrected with the I value), and the md5-picked duplicate
    * deliveries must be invisible in the output.
    */
  def u9CdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val u = base.where(col("k") % 5 === 0)
      .select(col("k"), lit(1L).as("seq"), lit("U").as("op"),
        (col("bal_cents") + 111L).as("v"))
    val d = base.where(col("k") % 7 === 0)
      .select(col("k"), lit(2L).as("seq"), lit("D").as("op"),
        lit(null).cast("long").as("v"))
    val i = base.where(col("k") % 7 === 0 && col("k") % 2 === 0)
      .select(col("k"), lit(3L).as("seq"), lit("I").as("op"), lit(55500L).as("v"))
    val feed = u.unionByName(d).unionByName(i)
    val redelivered = feed.where(
      pmod(graft.functions.Text.md5Long(concat_ws(":", col("k"), col("seq"))), lit(3)) === 0)
    val cdc = feed.unionByName(redelivered).distinct()
    val winners = cdc.groupBy("k")
      .agg(max_by(struct(col("op"), col("v")), col("seq")).as("w"))
    base.join(winners, Seq("k"), "full")
      .where(col("w").isNull || col("w.op") =!= "D")
      .select(col("k").as("c_custkey"),
        coalesce(col("w.v"), col("bal_cents")).as("bal_cents"),
        when(col("w").isNull, "base").otherwise(col("w.op")).as("src"))
      .orderBy("c_custkey")
  }

  val u9Oracle: String =
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer),
      |feed AS (
      |  SELECT k, CAST(1 AS BIGINT) AS seq, 'U' AS op, bal_cents + 111 AS v FROM base WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT k, 2, 'D', NULL FROM base WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k, 3, 'I', 55500 FROM base WHERE k % 7 = 0 AND k % 2 = 0),
      |cdc AS (
      |  SELECT DISTINCT * FROM (
      |    SELECT * FROM feed
      |    UNION ALL
      |    SELECT * FROM feed
      |    WHERE ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 3 = 0)),
      |w0 AS (SELECT k, max(seq) AS seq FROM cdc GROUP BY 1),
      |w AS (SELECT c.k, c.op, c.v FROM cdc c JOIN w0 USING (k, seq))
      |SELECT coalesce(b.k, w.k) AS c_custkey,
      |       CAST(coalesce(w.v, b.bal_cents) AS BIGINT) AS bal_cents,
      |       CASE WHEN w.k IS NULL THEN 'base' ELSE w.op END AS src
      |FROM base b FULL OUTER JOIN w ON b.k = w.k
      |WHERE w.k IS NULL OR w.op <> 'D'
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u9_cdc_apply" -> (u9CdcApply _),
    "u8_scd2_history" -> (u8Scd2History _),
    "u7_incremental_join" -> (u7IncrementalJoin _),
    "u6_incremental_distinct" -> (u6IncrementalDistinct _),
    "u1_argmax_aggregator" -> (u1ArgmaxAggregator _),
    "u2_upsert" -> (u2Upsert _),
    "u3_incremental_agg" -> (u3IncrementalAgg _),
    "u4_incremental_extrema" -> (u4IncrementalExtrema _),
    "u5_incremental_topk" -> (u5IncrementalTopK _))

  val oracles: Map[String, String] = Map(
    "u9_cdc_apply" -> u9Oracle,
    "u8_scd2_history" -> u8Oracle,
    "u7_incremental_join" -> u7Oracle,
    "u6_incremental_distinct" -> u6Oracle,
    "u1_argmax_aggregator" -> u1Oracle,
    "u2_upsert" -> u2Oracle,
    "u3_incremental_agg" -> u3Oracle,
    "u4_incremental_extrema" -> u4Oracle,
    "u5_incremental_topk" -> u5Oracle)
}
