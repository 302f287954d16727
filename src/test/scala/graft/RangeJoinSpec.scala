package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** RangeJoin.bandJoin: the bucketed composition must be row-for-row equal
  * to the naive theta join on every band shape — including bands that
  * straddle bucket boundaries, negative offsets, and half-open edges.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def naive(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      lowerUs: Long, upperUs: Long) = {
    import org.apache.spark.sql.functions._
    l.join(r, l("k") === r("k") &&
        unix_micros(r("rts")) >= unix_micros(l("lts")) + lowerUs &&
        unix_micros(r("rts")) < unix_micros(l("lts")) + upperUs)
      .select(l("lid"), r("rid")).orderBy("lid", "rid")
  }

  test("band join == naive theta join across band shapes") {
    import spark.implicits._
    val l = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:30:00")),
      (3L, 20L, ts("2024-01-01 10:00:00"))
    ).toDF("lid", "k", "lts")
    val r = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00")),
      (101L, 10L, ts("2024-01-01 09:59:59")),
      (102L, 10L, ts("2024-01-01 10:00:00")), // exactly at left ts
      (103L, 10L, ts("2024-01-01 10:59:59")),
      (104L, 20L, ts("2024-01-01 09:30:00")),
      (105L, 30L, ts("2024-01-01 10:00:00")) // unrelated key
    ).toDF("rid", "k", "rts")

    for ((lo, hi) <- Seq(
        (-3600000000L, 0L),            // preceding hour, exclusive of t
        (-3600000000L, 1L),            // inclusive of t
        (0L, 3600000000L),             // following hour
        (-300000000L, 300000000L),     // symmetric ±5m
        (-7200000000L, -3600000000L))) // a band entirely in the past
    {
      val got = RangeJoin.bandJoin(l, r, "k", "lts", "rts", lo, hi)
        .select("lid", "rid").orderBy("lid", "rid").collect()
      val want = naive(l, r, lo, hi).collect()
      assert(got.sameElements(want), s"band [$lo,$hi): got ${got.mkString(",")} want ${want.mkString(",")}")
    }
  }

  test("no duplicate matches when a band straddles a bucket boundary") {
    import spark.implicits._
    // width = band = 1h; left at 10:30 has band [09:30,10:30) covering two buckets
    val l = Seq((1L, 1L, ts("2024-01-01 10:30:00"))).toDF("lid", "k", "lts")
    val r = Seq((100L, 1L, ts("2024-01-01 09:45:00")), (101L, 1L, ts("2024-01-01 10:15:00")))
      .toDF("rid", "k", "rts")
    val got = RangeJoin.bandJoin(l, r, "k", "lts", "rts", -3600000000L, 0L).collect()
    assert(got.length == 2) // each right row matched exactly once
  }

  test("working bucket column name avoids user collisions") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts("2024-01-01 10:30:00"), "keepme")).toDF("lid", "k", "lts", "_bucket")
    val r = Seq((100L, 1L, ts("2024-01-01 10:00:00"))).toDF("rid", "k", "rts")
    val out = RangeJoin.bandJoin(l, r, "k", "lts", "rts", -3600000000L, 0L)
    assert(out.columns.count(_ == "_bucket") == 1)
    assert(out.select("_bucket").head.getString(0) == "keepme")
  }
}
