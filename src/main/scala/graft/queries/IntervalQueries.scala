package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.Tables

/** Interval/range joins (operators.RangeJoin) — the attribution-window
  * query class: "events of B within a time band around each event of A".
  * The reference has no theta joins (SURVEY.md §2.11); this supplies the
  * banded form with a shuffle-scalable plan (time bucketing, no
  * broadcast-nested-loop).
  */
object IntervalQueries {

  private val HourUs = 3600L * 1000000L

  /** r1: for every purchase, how many clicks the same user made in the
    * preceding hour `[ts−1h, ts)` — classic conversion-attribution window.
    * Inner band-join counts, then a left join restores zero-click
    * purchases.
    */
  def r1IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val counts = RangeJoin.bandJoin(p, c, "user_id", "p_ts", "c_ts", -HourUs, 0L)
      .groupBy("p_id").agg(count(lit(1)).as("clicks_1h"))
    p.join(counts, Seq("p_id"), "left")
      .select(col("p_id"), col("user_id"), col("p_ts"),
        coalesce(col("clicks_1h"), lit(0L)).as("clicks_1h"))
      .orderBy("p_id")
  }

  val r1Oracle: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
      |SELECT p.p_id, p.user_id, p.p_ts, CAST(count(c.user_id) AS BIGINT) AS clicks_1h
      |FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  AND epoch_us(c.c_ts) >= epoch_us(p.p_ts) - 3600000000
      |  AND epoch_us(c.c_ts) < epoch_us(p.p_ts)
      |GROUP BY 1, 2, 3
      |ORDER BY p_id""".stripMargin

  /** r2: band-join pairs themselves (error events within ±5 minutes of a
    * purchase by the same user) — exercises the symmetric band and the
    * pair-level output path of the operator.
    */
  def r2NearbyErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val e = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"), col("ts").as("e_ts"))
    RangeJoin.bandJoin(p, e, "user_id", "p_ts", "e_ts", -5L * 60 * 1000000L, 5L * 60 * 1000000L)
      .select(col("p_id"), col("e_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("delta_us"))
      .orderBy("p_id", "e_id")
  }

  val r2Oracle: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
      |     e AS (SELECT user_id, event_id AS e_id, ts AS e_ts FROM events WHERE event_type = 'error')
      |SELECT p.p_id, e.e_id, epoch_us(e.e_ts) - epoch_us(p.p_ts) AS delta_us
      |FROM p JOIN e ON e.user_id = p.user_id
      |  AND epoch_us(e.e_ts) >= epoch_us(p.p_ts) - 300000000
      |  AND epoch_us(e.e_ts) < epoch_us(p.p_ts) + 300000000
      |ORDER BY p_id, e_id""".stripMargin

  /** r3: interval-overlap join — each purchase's 30-minute influence
    * window against the same user's 5-minute error windows; a pair
    * reports once with its overlap length. The general two-interval form
    * of the band join (RangeJoin.overlapJoin).
    */
  def r3OverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_start"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("p_end"))
    val e = ev.where(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"),
        col("ts").as("e_start"), (col("ts") + expr("INTERVAL 5 MINUTES")).as("e_end"))
    RangeJoin.overlapJoin(p, e, "user_id", "p_start", "p_end", "e_start", "e_end",
        bucketUs = 30L * 60 * 1000000L)
      .select(col("p_id"), col("e_id"),
        (least(unix_micros(col("p_end")), unix_micros(col("e_end"))) -
          greatest(unix_micros(col("p_start")), unix_micros(col("e_start")))).as("overlap_us"))
      .orderBy("p_id", "e_id")
  }

  val r3Oracle: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS ps, epoch_us(ts) + 1800000000 AS pe
      |           FROM events WHERE event_type = 'purchase'),
      |     e AS (SELECT event_id AS e_id, user_id, epoch_us(ts) AS es, epoch_us(ts) + 300000000 AS ee
      |           FROM events WHERE event_type = 'error')
      |SELECT p.p_id, e.e_id, least(pe, ee) - greatest(ps, es) AS overlap_us
      |FROM p JOIN e ON e.user_id = p.user_id AND ps < ee AND es < pe
      |ORDER BY p_id, e_id""".stripMargin

  /** r4: calendar gap-fill + forward fill (last observation carried
    * forward) — the time-series densification every balance/metrics table
    * needs: per-account daily totals joined onto a continuous calendar
    * spine (`sequence` explode, executor-side), missing days filled with
    * the latest prior observation via `last(…, ignoreNulls)` over an
    * account-keyed running frame; days before an account's first
    * observation stay NULL, and `observed` marks real rows. Spine bounds
    * are a 1-row scalar broadcast (K4); the fill is one account-keyed
    * window — the w-family shuffle envelope, linear in accounts × days.
    */
  def r4GapFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .where(col("o_custkey") % 100 === 0)
      .groupBy(col("o_custkey").as("acc"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
    val spine = daily.select("acc").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("acc"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy("acc").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("acc", "day"), "left")
      .select(col("acc"), col("day"),
        last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"),
        col("cents").isNotNull.as("observed"))
      .orderBy("acc", "day")
  }

  val r4Oracle: String =
    """WITH daily AS (
      |  SELECT o_custkey AS acc, CAST(o_orderdate AS DATE) AS day,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE o_custkey % 100 = 0 GROUP BY 1, 2),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      |spine AS (
      |  SELECT acc, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT DISTINCT acc FROM daily), b),
      |j AS (
      |  SELECT s.acc, s.day, d.cents
      |  FROM spine s LEFT JOIN daily d ON d.acc = s.acc AND d.day = s.day)
      |SELECT acc, day,
      |       last_value(cents IGNORE NULLS) OVER (PARTITION BY acc ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
      |       cents IS NOT NULL AS observed
      |FROM j ORDER BY acc, day""".stripMargin

  /** r5: per-user interval-UNION coverage — every event opens a 30-minute
    * activity interval `[ts, ts+30m)`; overlapping intervals merge and
    * the output is each user's merged-interval count + total covered
    * time. The classic sweep, expressed scale-right: a running max of
    * prior interval ends (window) detects island starts, a cumulative sum
    * numbers the islands (d10's span-merge shape on the time axis). All
    * three passes share one user-keyed Exchange+Sort; nothing is
    * data-sized on the driver and nothing self-joins. Tie rows (same
    * user, same instant) are frame-safe: the island flag lands on
    * whichever tied row sorts first, but the RANGE-framed cumulative sum
    * gives peers the same island id, so the merged result is
    * order-independent.
    */
  def r5IntervalUnion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val HalfH = 1800L * 1000000L
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + lit(HalfH))
    val w = Window.partitionBy("user_id").orderBy("s", "e")
    val isl = iv
      .withColumn("ni",
        when(col("s") > coalesce(
          max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("island", sum("ni").over(w)) // default RANGE frame: peers share the island id
    isl.groupBy("user_id", "island")
      .agg(min("s").as("i_s"), max("e").as("i_e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("i_e") - col("i_s")).as("covered_us"))
      .orderBy("user_id")
  }

  val r5Oracle: String =
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events),
      |m AS (
      |  SELECT user_id, s, e,
      |         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775807)
      |              THEN 1 ELSE 0 END AS ni
      |  FROM iv),
      |isl AS (
      |  SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY s, e) AS island FROM m),
      |g AS (SELECT user_id, island, min(s) AS i_s, max(e) AS i_e FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
      |       CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r5_interval_union" -> (r5IntervalUnion _),
    "r4_gap_fill" -> (r4GapFill _),
    "r1_interval_join" -> (r1IntervalJoin _),
    "r2_nearby_errors" -> (r2NearbyErrors _),
    "r3_overlap_join" -> (r3OverlapJoin _))

  val oracles: Map[String, String] = Map(
    "r5_interval_union" -> r5Oracle,
    "r4_gap_fill" -> r4Oracle,
    "r1_interval_join" -> r1Oracle,
    "r2_nearby_errors" -> r2Oracle,
    "r3_overlap_join" -> r3Oracle)
}
