package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Open-session state for the stateful sessionizer. Top-level (not nested in
  * the object) so Spark's encoder codegen — Janino-compiled Java — can
  * resolve its accessors.
  */
case class OpenSession(start: Long, end: Long, n: Long, total: Double)

/** Structured-Streaming operators over the `events` stream (builder brief;
  * SURVEY.md §1.5 — the reference's incrementality is a batch watermark, so
  * the true-streaming surface is our extension, expressed with the standard
  * Spark streaming primitives: `withWatermark` + windowed aggregation, and
  * `flatMapGroupsWithState` for custom session state).
  *
  * Every transform here takes a plain DataFrame so it runs identically on a
  * batch frame (unit-testable, oracle-checkable) and on a `readStream`
  * source — the Structured Streaming contract that batch and stream share
  * one logical plan.
  */
object StreamingOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** On-disk schema: `ts` is TIMESTAMP(NANOS) parquet, readable only as raw
    * nanos (`spark.sql.legacy.parquet.nanosAsLong`); pipe the source through
    * [[graft.sources.Tables.normalizeEventTs]] to get [[eventSchema]].
    */
  val rawEventSchema: StructType = StructType(
    eventSchema.fields.map(f => if (f.name == "ts") f.copy(dataType = LongType) else f))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Tumbling-window counts per event type. On a stream, `watermarkDelay`
    * bounds state: windows older than (max event time − delay) finalize and
    * drop.
    */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

  /** Sliding-window (1h window, 15m slide) counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): a session closes when the next event of
    * the user arrives more than `gapMinutes` later. Emits *closed* sessions;
    * the open tail of each user stays in state (in production a timeout
    * would flush it — kept un-timed here so emission is deterministic for
    * the batch-equivalence spec).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L * 1000L // microseconds, matching the batch twin

    def micros(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

    def fromMicros(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def fold(userId: Long, it: Iterator[Event], state: GroupState[OpenSession]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = micros(e.ts)
        open match {
          case Some(s) if t - s.end <= gapMs =>
            open = Some(s.copy(end = t, n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            closed += Session(userId, fromMicros(s.start), fromMicros(s.end), s.n, s.total)
            open = Some(OpenSession(t, t, 1L, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
