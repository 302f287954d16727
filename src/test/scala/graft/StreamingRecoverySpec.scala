package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventQueries
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Exactly-once stateful recovery: the sessionizer runs over the first
  * half of the event timeline, the query STOPS (checkpoint persists the
  * open-session state), the second half arrives, and a NEW query run
  * resumes from the checkpoint — the union of emitted sessions must equal
  * the batch sessionization of the full data (sessions spanning the
  * restart boundary included). This is the streaming analog of the
  * pipeline's crash-safe watermark ordering (SURVEY.md C4).
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessionization survives a restart via checkpoint") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-recovery").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(srcDir).mkdirs()

    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val cutMicros = events.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head.getLong(0)

    def run(): Unit = {
      val stream = graft.sources.Tables.normalizeEventTs(
          spark.readStream.schema(StreamingOps.rawEventSchema(spark, srcDir)).parquet(srcDir))
        .select("event_id", "ts", "user_id", "event_type", "value").as[StreamingOps.Event]
      val q = StreamingOps.sessionize(spark, stream).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // first half arrives (normalized timestamps), stream runs, stops
    events.where(expr(s"unix_micros(ts) <= ${cutMicros}L")).write.mode("append").parquet(srcDir)
    run()
    // second half arrives; a NEW query recovers state from the checkpoint
    events.where(expr(s"unix_micros(ts) > ${cutMicros}L")).write.mode("append").parquet(srcDir)
    run()

    val got = spark.read.parquet(outDir)
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect()

    val all = EventQueries.e3Sessions(spark, sfDir)
    val lastPerUser = all.groupBy("user_id").agg(max(col("session_id")).as("session_id"))
    val want = all.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect()

    assert(got.length == want.length,
      s"emitted ${got.length} closed sessions, batch says ${want.length}")
    assert(got.sameElements(want))
  }

  test("dropDuplicatesWithinWatermark dedup state survives a restart") {
    val root = Files.createTempDirectory("graft-dedup-recovery").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(srcDir).mkdirs()

    def run(): Unit = {
      val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(StreamingOps.rawEventSchema(spark, srcDir)).parquet(srcDir))
      val q = StreamingOps.dedupEvents(stream, "60 days")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // file streams list the directory non-recursively: deliver flat files
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/batch1.parquet"))
    run()
    // the SAME events redelivered after the restart: the id state recovered
    // from the checkpoint must suppress every one of them
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/batch2.parquet"))
    run()

    val n = spark.read.parquet(s"$sfDir/events.parquet").count()
    val got = spark.read.parquet(outDir).count()
    assert(got == n, s"redelivery after restart duplicated rows: $got vs $n")
  }

  test("first-seen state survives a restart: no re-emission for keys seen before the crash") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-fseen-recovery").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(srcDir).mkdirs()

    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1990-01-01"))).cast("int").as("dayN"))
    val cut = rows.agg(expr("percentile_approx(dayN, 0.5)")).head.getInt(0)

    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_type STRING, user_id BIGINT, dayN INT").parquet(srcDir)
        .as[StreamingOps.FirstSeenIn]
      val q = StreamingOps.firstSeenStream(spark, stream).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // chronological halves with a RESTART between them; the second half
    // re-contains many (type, user) keys from the first — only the
    // checkpointed state can suppress their re-emission
    rows.where(col("dayN") <= cut).coalesce(1).write.mode("append").parquet(srcDir)
    run()
    rows.where(col("dayN") > cut).coalesce(1).write.mode("append").parquet(srcDir)
    run()

    val got = spark.read.parquet(outDir)
    assert(got.groupBy("event_type", "user_id").count().where(col("count") > 1).isEmpty,
      "a key emitted twice across the restart — first-seen state was lost")
    val want = rows.groupBy("event_type", "user_id").agg(min("dayN").as("dayN"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want.select("event_type", "user_id", "dayN")).isEmpty)
  }
}
