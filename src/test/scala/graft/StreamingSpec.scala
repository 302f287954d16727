package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventQueries
import graft.streaming.StreamingOps

/** Streaming ⇔ batch equivalence (the Structured Streaming contract): the
  * same StreamingOps transform applied to a `readStream` file source under
  * `Trigger.AvailableNow` must reproduce the batch result that the DuckDB
  * oracle checks.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  /** events.parquet copied into its own dir — file stream sources read
    * directories.
    */
  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-events").toString
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d
  }

  private def runStream(out: DataFrame, mode: String, name: String): DataFrame = {
    val q = out.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming tumbling-window counts == batch result") {
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(StreamingOps.rawEventSchema).parquet(streamDir))
    val got = runStream(StreamingOps.windowedCounts(stream), "complete", "wc")
      .orderBy("wstart", "event_type").collect()
    val want = EventQueries.e1WindowedCounts(spark, sfDir).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("streaming sessionization (flatMapGroupsWithState) == batch closed sessions") {
    import spark.implicits._
    val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(StreamingOps.rawEventSchema).parquet(streamDir))
      .select("event_id", "ts", "user_id", "event_type", "value").as[StreamingOps.Event]
    val got = runStream(StreamingOps.sessionize(spark, stream).toDF(), "append", "sess")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect()

    // batch twin: all sessions minus each user's last (still open in state)
    val all = EventQueries.e3Sessions(spark, sfDir)
    val lastPerUser = all.groupBy("user_id").agg(max(col("session_id")).as("session_id"))
    val want = all.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect()

    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("batch sessionization totals are exact decimal sums (order-independent)") {
    val df = EventQueries.e3Sessions(spark, sfDir)
    val total = df.agg(sum(col("total_value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    val direct = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(math.abs(total - direct) < 1e-9)
  }
}
