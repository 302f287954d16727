package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Analytic window functions (SURVEY.md §2.11 lists them as absent from the
  * reference surface — this module supplies the full class: running
  * aggregates, lag/lead deltas, ranking/tiles, and frame-bounded moving
  * aggregates).
  *
  * Scale notes: every query here is a single hash shuffle on the partition
  * key followed by an in-partition sort — the same cost envelope as a
  * groupBy. Partition keys are chosen with bounded per-key cardinality
  * (orders per customer, events per user, customers per nation), so no
  * single window partition can approach executor memory even at 100 TB.
  * Cross-engine determinism: money runs in integer cents, gaps in integer
  * microseconds, averages as exact-int sums divided in double — see the
  * repo determinism notes.
  */
object WindowQueries {

  /** w1: running order count + running spend (cents) per customer, ordered
    * by (date, key) so ties can't reorder.
    */
  def w1RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).cast("int").as("run_cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).over(w).as("run_cents"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val w1Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(count(1) OVER w AS INTEGER) AS run_cnt,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** w2: per-user inter-event gap (µs) and value delta (cents) vs the
    * previous event — LAG with a deterministic (ts, event_id) order.
    */
  def w2LagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        (round(col("value") * 100).cast("long") -
          lag(round(col("value") * 100).cast("long"), 1).over(w)).as("dvalue_cents"))
      .orderBy("event_id")
  }

  val w2Oracle: String =
    """SELECT event_id, user_id,
      |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
      |       CAST(round(value * 100) AS BIGINT) -
      |         lag(CAST(round(value * 100) AS BIGINT), 1) OVER w AS dvalue_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** w3: ranking battery per nation over account balance — rank,
    * dense_rank, quartile tile, percent_rank, cume_dist in one pass (one
    * shuffle, one sort serves all five).
    */
  def w3RankTiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"), col("c_nationkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("tile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("c_custkey")
  }

  val w3Oracle: String =
    """SELECT c_custkey, c_nationkey,
      |       CAST(rank() OVER w AS INTEGER) AS rnk,
      |       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
      |       CAST(ntile(4) OVER w AS INTEGER) AS tile,
      |       percent_rank() OVER w AS prank,
      |       cume_dist() OVER w AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** w4: 7-day moving average of daily revenue — pre-aggregate to days
    * (shrinks the window input from O(orders) to O(days)), then a 7-row
    * frame. The average is exact-int sum / count in double, so both
    * engines agree bit-for-bit.
    */
  def w4MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    daily
      .select(
        col("day"),
        col("cents"),
        (sum(col("cents")).over(w).cast("double") / count(lit(1)).over(w)).as("mov7"))
      .orderBy("day")
  }

  val w4Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT day, cents,
      |       CAST(sum(cents) OVER w AS DOUBLE) / (count(1) OVER w) AS mov7
      |FROM daily
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** w5: the same 7-day moving average with a DEFENSIVE partitioned frame —
    * the 100 TB form of w4. w4's unpartitioned `Window.orderBy(day)` is
    * safe only because its input is pre-aggregated to calendar days
    * (cardinality-bounded: a century is ~36k rows on one partition); when
    * the series key is NOT bounded (per-entity series, minute grain), the
    * single-partition sort is the scale cliff. The standard fix, shown
    * here on the same data so the oracle proves equivalence: partition by
    * a coarse time bucket (year), duplicate each bucket's last 6 rows into
    * the NEXT bucket as context rows, run the frame per-partition, drop
    * the context rows. Every partition sorts independently; no global
    * sort, no single-partition window. Precondition: consecutive buckets
    * are non-empty (true for any dense daily series — a gap year would
    * need context from further back).
    */
  def w5MovingAvgPart(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val byYear = daily.withColumn("yr", year(col("day")))
    val tailW = Window.partitionBy("yr").orderBy(col("day").desc)
    val context = byYear.withColumn("_rn", row_number().over(tailW))
      .where(col("_rn") <= 6).drop("_rn")
      .withColumn("yr", col("yr") + 1)
      .withColumn("_ctx", lit(true))
    val all = byYear.withColumn("_ctx", lit(false)).unionByName(context)
    val w = Window.partitionBy("yr").orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    all
      .select(
        col("day"),
        col("cents"),
        (sum(col("cents")).over(w).cast("double") / count(lit(1)).over(w)).as("mov7"),
        col("_ctx"))
      .where(!col("_ctx"))
      .drop("_ctx")
      .orderBy("day")
  }

  /** w6: a TIME-RANGE frame — per customer the trailing-30-day spend,
    * `RANGE BETWEEN 29 PRECEDING AND CURRENT ROW` over an epoch-day
    * ordinal. Rows-frames (w4/w5) count ROWS and silently widen over
    * date gaps; a range frame bounds by VALUE distance, the semantic a
    * sliding time window actually needs. Pre-aggregated per (customer,
    * day) so the frame contents are unambiguous; the customer filter
    * drops whole partitions, so applying it before the window is exact.
    */
  def w6RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .where(col("o_custkey") % 100 === 0)
      .groupBy(col("o_custkey").as("acc"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("dayn", datediff(col("day"), to_date(lit("1990-01-01"))).cast("long"))
    val w = Window.partitionBy("acc").orderBy("dayn").rangeBetween(-29, 0)
    daily
      .select(col("acc"), col("day"), col("cents"),
        sum(col("cents")).over(w).as("cents_30d"))
      .orderBy("acc", "day")
  }

  val w6Oracle: String =
    """WITH daily AS (
      |  SELECT o_custkey AS acc, CAST(o_orderdate AS DATE) AS day,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE o_custkey % 100 = 0 GROUP BY 1, 2),
      |d2 AS (SELECT acc, day, cents,
      |              date_diff('day', DATE '1990-01-01', day) AS dayn FROM daily)
      |SELECT acc, day, cents,
      |       CAST(sum(cents) OVER (PARTITION BY acc ORDER BY dayn
      |                             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cents_30d
      |FROM d2 ORDER BY acc, day""".stripMargin

  /** w7: cumulative distinct users per event type by day — the "users to
    * date" metric. A naive `COUNT(DISTINCT) OVER (ORDER BY day)` needs
    * per-frame distinct state and most engines (Spark included) refuse
    * it; the scalable identity is: a user counts on exactly ONE day —
    * their first — so cumulative-distinct = running SUM of first-seen
    * counts. One (type, user) aggregation (the only user-cardinality
    * shuffle), one (type, day) rollup, one tiny running-sum window whose
    * partitions are |types| × |days| — constant in event volume. Days
    * with zero first-timers don't emit a row (join a calendar spine to
    * densify — q7's generator).
    */
  def w7RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstDay.groupBy("event_type", "day")
      .agg(count(lit(1)).as("new_users"))
      .select(col("event_type"), col("day"), col("new_users"),
        sum("new_users").over(w).as("cum_users"))
      .orderBy("event_type", "day")
  }

  val w7Oracle: String =
    """WITH fd AS (
      |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day
      |  FROM events GROUP BY 1, 2),
      |daily AS (SELECT event_type, day, count(1) AS new_users FROM fd GROUP BY 1, 2)
      |SELECT event_type, day, new_users,
      |       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
      |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum_users
      |FROM daily ORDER BY event_type, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w7_running_distinct" -> (w7RunningDistinct _),
    "w6_range_window" -> (w6RangeWindow _),
    "w1_running_total" -> (w1RunningTotal _),
    "w2_lag_delta" -> (w2LagDelta _),
    "w3_rank_tiles" -> (w3RankTiles _),
    "w4_moving_avg" -> (w4MovingAvg _),
    "w5_moving_avg_part" -> (w5MovingAvgPart _))

  val oracles: Map[String, String] = Map(
    "w7_running_distinct" -> w7Oracle,
    "w6_range_window" -> w6Oracle,
    "w1_running_total" -> w1Oracle,
    "w2_lag_delta" -> w2Oracle,
    "w3_rank_tiles" -> w3Oracle,
    "w4_moving_avg" -> w4Oracle,
    // identical oracle text to w4 — the partitioned overlap plan must
    // reproduce the global-window answer exactly
    "w5_moving_avg_part" -> w4Oracle)
}
