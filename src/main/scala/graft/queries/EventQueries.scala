package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingOps

/** Batch-side event/stream analytics over the `events` table. Each query is
  * the batch twin of a streaming transform in [[graft.streaming.StreamingOps]]
  * (same logical plan on a `readStream` source — StreamingSpec proves the
  * equivalence); the DuckDB oracles pin the semantics.
  *
  * Double sums go through DECIMAL(18,2) so the aggregate is exact and
  * order-independent — the cross-engine float-sum trap (verify skill notes).
  */
object EventQueries {

  /** Tumbling 1-hour windows per event type (streaming twin: windowedCounts). */
  def e1WindowedCounts(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.windowedCounts(Tables.events(spark, dir))
      .orderBy("wstart", "event_type")

  val e1Oracle: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type, count(1) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** Sliding windows: 1 hour wide, every 15 minutes (streaming twin:
    * slidingCounts). The oracle expands the 4 overlapping windows per event.
    */
  def e2SlidingCounts(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.slidingCounts(Tables.events(spark, dir))
      .orderBy("wstart", "event_type")

  val e2Oracle: String =
    """WITH expanded AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart, event_type
      |  FROM events, unnest(range(0, 4)) AS r(k))
      |SELECT wstart, event_type, count(1) AS cnt
      |FROM expanded GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** Gap-based sessionization (30-minute inactivity) via window functions —
    * the declarative twin of the stateful flatMapGroupsWithState
    * sessionizer. One shuffle on user_id; the per-user sort rides the same
    * exchange.
    */
  def e3Sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L).cast("int"))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("user_id", "session_id")
  }

  val e3Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
      |       count(1) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  /** Per-user rollup with exact decimal sums — the profile-table shape. */
  def e4UserStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        max(col("ts")).as("last_seen"))
      .orderBy("user_id")

  val e4Oracle: String =
    """SELECT user_id, count(1) AS n_events, count(DISTINCT event_type) AS n_types,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       max(ts) AS last_seen
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Sessionization #3 — Spark's native `session_window` (dynamic-gap
    * merge windows). Same 30-minute gap semantics as e3's window-function
    * form and the stateful sessionizer: a new session starts strictly
    * after prev_ts + gap. Works identically on a stream with a watermark.
    */
  def e6SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")

  val e6Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start, count(1) AS n_events
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Semi-structured parsing: the `props` column is a JSON document;
    * extract the typed field with schema-on-read (`from_json`) and
    * aggregate — the event-payload shape every telemetry pipeline has.
    */
  def e5PropsJson(spark: SparkSession, dir: String): DataFrame = {
    val props = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    Tables.events(spark, dir)
      .select(col("event_type"), props.getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
      .orderBy("event_type")
  }

  val e5Oracle: String =
    """SELECT event_type, count(1) AS n,
      |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** e7: at-least-once replay dedup — the corpus with every 3rd event
    * redelivered, deduplicated on event_id, then per-type totals (streaming
    * twin: StreamingOps.dedupEvents with dropDuplicatesWithinWatermark).
    * One shuffle on the dedup key; at 100 TB the watermark bounds how long
    * each id stays in state, which the batch form has no analog of.
    */
  def e7DedupEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val replayed = ev.unionByName(ev.where(col("event_id") % 3 === 0))
    replayed.dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .orderBy("event_type")
  }

  val e7Oracle: String =
    """WITH replayed AS (
      |  SELECT * FROM events UNION ALL SELECT * FROM events WHERE event_id % 3 = 0),
      |deduped AS (SELECT DISTINCT * FROM replayed)
      |SELECT event_type, count(1) AS cnt,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM deduped GROUP BY 1 ORDER BY 1""".stripMargin

  /** e8: sequential conversion funnel — users whose first view is followed
    * by a click, then a purchase, in strict event-time order. Each stage
    * is one aggregation + one join keyed on user_id, so the three stages
    * ride the SAME hash partitioning (no re-shuffle between stages); the
    * final stage counts cross-join as driver scalars (K4-style).
    */
  def e8Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
  }

  val e8Oracle: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.v_ts
      |      WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.c_ts
      |      WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT (SELECT count(1) FROM v) AS n_view,
      |       (SELECT count(1) FROM c) AS n_click_after,
      |       (SELECT count(1) FROM p) AS n_purchase_after""".stripMargin

  /** e9: cohort retention — the activation/retention grid every product
    * and data-flywheel dashboard needs: users bucketed by first-seen day,
    * counted on each later active day as an offset from their cohort.
    * Three keyed shuffles (distinct user-day, per-user min, the grid
    * agg); the user-keyed join co-partitions with the cohort agg, so at
    * 100 TB the only wide exchange is on user_id.
    */
  def e9Retention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohort = act.groupBy("user_id").agg(min("d").as("cohort_day"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users")) // act is distinct (user, d): 1 row per user per cell
      .orderBy("cohort_day", "day_offset")
  }

  val e9Oracle: String =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d FROM events),
      |c AS (SELECT user_id, min(d) cohort_day FROM act GROUP BY 1)
      |SELECT cohort_day, CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
      |       count(1) AS n_users
      |FROM act JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** e10: session path analysis — the event-type transition matrix
    * (Markov bigram counts) within the e3 session gap: for each
    * consecutive in-session pair, count (from → to). One window pass
    * keyed on user_id (the e3 partitioning — horizontal user growth
    * parallelizes) and one small groupBy on the type pair; output
    * cardinality is |types|², constant in event volume. Micros
    * arithmetic mirrors e3's cross-engine idiom.
    */
  def e10Transitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .where(col("prev_type").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) <= 1800L * 1000000L)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
  }

  val e10Oracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type, ts,
      |         lag(event_type) OVER w AS prev_type,
      |         lag(ts) OVER w AS prev_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT prev_type AS from_type, event_type AS to_type, count(1) AS n
      |FROM seq
      |WHERE prev_type IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) <= 1800000000
      |GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type""".stripMargin

  /** e11: error-burst detection — per-hour error volume scored against
    * the global rate, all in INTEGER arithmetic so the hash is exact:
    * `dev_micro = (n·nmin·10⁶) DIV total − 10⁶` (the first term is
    * non-negative, where Spark DIV and DuckDB // floor identically; the
    * subtraction happens after) and the burst flag is the pure integer
    * comparison `n·nmin > 2·total`. Every window row is emitted with its
    * score — the monitoring-table shape — rather than only exceedances
    * (on a uniform corpus the flag column is honest-false, and a real
    * burst flips it with no threshold float math to drift).
    *
    * Scale shape: one (hour) partial-agg shuffle over the error slice +
    * a 1-row scalar broadcast (K4 pattern) — never a second scan.
    */
  def e11ErrorBursts(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .where(col("event_type") === "error")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_errors"))
    val tot = hourly.agg(sum("n_errors").as("total"), count(lit(1)).as("nmin"))
    hourly.crossJoin(broadcast(tot))
      .selectExpr("hour", "n_errors",
        "CAST((n_errors * nmin * 1000000) DIV total - 1000000 AS BIGINT) AS dev_micro",
        "n_errors * nmin > 2 * total AS burst")
      .orderBy("hour")
  }

  val e11Oracle: String =
    """WITH e AS (
      |  SELECT date_trunc('hour', ts) AS hour, count(1) AS n_errors
      |  FROM events WHERE event_type = 'error' GROUP BY 1),
      |t AS (SELECT CAST(sum(n_errors) AS BIGINT) AS total, count(1) AS nmin FROM e)
      |SELECT hour, n_errors,
      |       CAST((n_errors * nmin * 1000000) // total - 1000000 AS BIGINT) AS dev_micro,
      |       n_errors * nmin > 2 * total AS burst
      |FROM e, t ORDER BY hour""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e11_error_bursts" -> (e11ErrorBursts _),
    "e10_transitions" -> (e10Transitions _),
    "e9_retention" -> (e9Retention _),
    "e1_windowed_counts" -> (e1WindowedCounts _),
    "e2_sliding_counts" -> (e2SlidingCounts _),
    "e3_sessions" -> (e3Sessions _),
    "e4_user_stats" -> (e4UserStats _),
    "e5_props_json" -> (e5PropsJson _),
    "e6_session_window" -> (e6SessionWindow _),
    "e7_dedup_events" -> (e7DedupEvents _),
    "e8_funnel" -> (e8Funnel _))

  val oracles: Map[String, String] = Map(
    "e11_error_bursts" -> e11Oracle,
    "e10_transitions" -> e10Oracle,
    "e9_retention" -> e9Oracle,
    "e1_windowed_counts" -> e1Oracle,
    "e2_sliding_counts" -> e2Oracle,
    "e3_sessions" -> e3Oracle,
    "e4_user_stats" -> e4Oracle,
    "e5_props_json" -> e5Oracle,
    "e6_session_window" -> e6Oracle,
    "e7_dedup_events" -> e7Oracle,
    "e8_funnel" -> e8Oracle)
}
