package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** AsOfJoin edge semantics: greatest right ts <= left ts per key, equal
  * timestamps match, probes before any state row drop (inner), keys never
  * cross.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest prior state, inner semantics") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 5.0),   // after two states → latest wins
      (2L, 10L, ts("2024-01-01 08:00:00"), 6.0),   // before any state → dropped
      (3L, 10L, ts("2024-01-01 09:00:00"), 7.0),   // equal ts → matches (>=)
      (4L, 20L, ts("2024-01-01 12:00:00"), 8.0)    // other key, no state → dropped
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0),
      (10L, ts("2024-01-01 09:30:00"), 2.0),
      (30L, ts("2024-01-01 00:00:00"), 9.0) // unrelated key
    ).toDF("user_id", "signup_ts", "signup_value")

    val got = AsOfJoin(left, right, "user_id", "ts", "signup_ts", Seq("signup_value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(4), r.getDouble(5)))

    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01 09:30:00"), 2.0),
      (3L, ts("2024-01-01 09:00:00"), 1.0)))
  }

  test("as-of join output keeps all left columns") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"), 5.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 1.0)).toDF("user_id", "signup_ts", "signup_value")
    val out = AsOfJoin(left, right, "user_id", "ts", "signup_ts", Seq("signup_value"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "value", "signup_ts", "signup_value"))
  }

  test("left side may use the internal working-column names (collision-free suffix)") {
    import spark.implicits._
    // `_ts`/`_side`/`_state`/`_latest` as USER columns must survive untouched
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "u_ts", "u_side", "u_state", "u_latest"))
      .toDF("event_id", "user_id", "ts", "_ts", "_side", "_state", "_latest")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 1.0)).toDF("user_id", "signup_ts", "signup_value")
    val out = AsOfJoin(left, right, "user_id", "ts", "signup_ts", Seq("signup_value"))
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "_ts", "_side", "_state", "_latest", "signup_ts", "signup_value"))
    val r = out.collect().head
    assert(r.getString(3) == "u_ts" && r.getString(4) == "u_side" &&
      r.getString(5) == "u_state" && r.getString(6) == "u_latest")
    assert(r.getTimestamp(7) == ts("2024-01-01 09:00:00") && r.getDouble(8) == 1.0)
  }

  test("forward direction picks the NEXT state; equal instants match both ways") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 09:10:00"), 1.0), // between states → next wins
      (2L, 10L, ts("2024-01-01 09:30:00"), 2.0), // equal ts → matches (>=)
      (3L, 10L, ts("2024-01-01 10:00:00"), 3.0)  // after the last state → dropped
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0),
      (10L, ts("2024-01-01 09:30:00"), 2.0)
    ).toDF("user_id", "state_ts", "state_value")
    val got = AsOfJoin(left, right, "user_id", "ts", "state_ts", Seq("state_value"),
      direction = "forward").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(4)))
    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01 09:30:00")),
      (2L, ts("2024-01-01 09:30:00"))))
  }

  test("tolerance discards the nearest match when too far; outer keeps the row with NULLs") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0), // state 30 min earlier → within 1h
      (2L, 10L, ts("2024-01-01 12:00:00"), 2.0)  // state 2.5h earlier → beyond 1h
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((10L, ts("2024-01-01 09:30:00"), 7.0))
      .toDF("user_id", "state_ts", "state_value")
    val inner = AsOfJoin(left, right, "user_id", "ts", "state_ts", Seq("state_value"),
      toleranceMicros = Some(3600L * 1000000L)).collect()
    assert(inner.map(_.getLong(0)).toSeq == Seq(1L))
    val outer = AsOfJoin(left, right, "user_id", "ts", "state_ts", Seq("state_value"),
      toleranceMicros = Some(3600L * 1000000L), outer = true)
      .orderBy("event_id").collect()
    assert(outer.length == 2)
    assert(outer(0).getDouble(5) == 7.0)
    assert(outer(1).isNullAt(4) && outer(1).isNullAt(5))
  }
}
