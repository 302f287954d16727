package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** [[graft.operators.Scd2]] semantics on a crafted changelog plus the plan
  * contract its Scaladoc claims: all three window passes share ONE
  * Exchange+Sort on the dimension key.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("collapse: per-instant winner, no-op drop, validity stitch, current flag") {
    // key 1: A at t1 (two events same instant — tie 12 wins), A again at t2
    // (no-op, dropped), B at t3. key 2: single version.
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A", 11L), // wins the instant: highest tie
      (1L, ts("2024-01-01 00:00:00"), "Z", 10L),
      (1L, ts("2024-01-02 00:00:00"), "A", 20L),
      (1L, ts("2024-01-03 00:00:00"), "B", 30L),
      (2L, ts("2024-02-01 00:00:00"), "C", 40L)
    ).toDF("k", "t", "attr", "ev")
    val out = Scd2.build(log, Seq("k"), "attr", "t", "ev")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      // instant winner at t1 is the LAST event (ev 11 → attr A); t2's A is a no-op
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", ts("2024-01-03 00:00:00"), None, true),
      (2L, "C", ts("2024-02-01 00:00:00"), None, true)))
  }

  test("flapping attribute keeps every genuine change as its own version") {
    val log = Seq(
      (7L, ts("2024-01-01 00:00:00"), "X", 1L),
      (7L, ts("2024-01-02 00:00:00"), "Y", 2L),
      (7L, ts("2024-01-03 00:00:00"), "X", 3L)
    ).toDF("k", "t", "attr", "ev")
    val out = Scd2.build(log, Seq("k"), "attr", "t", "ev").orderBy("valid_from")
      .select("attr", "is_current").as[(String, Boolean)].collect().toSeq
    assert(out == Seq(("X", false), ("Y", false), ("X", true)))
  }

  test("streaming SCD2 closed versions == batch operator across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingOps
    implicit val sqlCtx = spark.sqlContext

    val dir = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"), unix_micros(col("o_orderdate").cast("timestamp")).as("tsMicros"),
        col("o_orderkey").as("tie"), col("o_orderpriority").as("attr"))
      .as[StreamingOps.Scd2In].collect().sortBy(e => (e.tsMicros, e.tie))
    // split at INSTANT boundaries: the cross-batch contract is strictly
    // increasing ts per key, so one (key, instant) never spans batches
    val instants = rows.map(_.tsMicros).distinct.sorted
    val (c1, c2) = (instants(instants.length / 3), instants(2 * instants.length / 3))
    val b1 = rows.filter(_.tsMicros < c1)
    val b2 = rows.filter(e => e.tsMicros >= c1 && e.tsMicros < c2)
    val b3 = rows.filter(_.tsMicros >= c2)

    val mem = MemoryStream[StreamingOps.Scd2In]
    val q = StreamingOps.scd2Stream(spark, mem.toDS())
      .writeStream.format("memory").queryName("sscd2").outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sscd2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted
    val want = Scd2.build(
        graft.sources.Tables.orders(spark, dir)
          .select(col("o_custkey").as("key"), col("o_orderdate").cast("timestamp").as("t"),
            col("o_orderpriority").as("attr"), col("o_orderkey").as("ev")),
        Seq("key"), "attr", "t", "ev")
      .where(col("valid_to").isNotNull)
      .select(col("key"), col("attr"), unix_micros(col("valid_from")), unix_micros(col("valid_to")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.length == want.length)
    assert(got.toSeq == want.toSeq)
  }

  test("plan: the three window passes share a single Exchange and a single Sort") {
    val log = Seq((1L, ts("2024-01-01 00:00:00"), "A", 1L)).toDF("k", "t", "attr", "ev")
    val plan = Scd2.build(log, Seq("k"), "attr", "t", "ev")
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*[+:*-]*\\s*\\*?\\(?\\d*\\)?\\s*Exchange hashpartitioning".r
      .findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash Exchange, plan:\n$plan")
    assert(sorts == 1, s"expected one Sort, plan:\n$plan")
  }
}
