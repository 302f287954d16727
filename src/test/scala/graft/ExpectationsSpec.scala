package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations.Rule

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),    // fails positive
      (3L, None, "ok"),          // NULL predicate result => violation
      (4L, Some(3.0), "bad"),    // fails status
      (5L, Some(-1.0), "bad")    // fails both
    ).toDF("id", "amount", "status")
  }

  private val rules = Seq(
    Rule("positive", col("amount") > 0),
    Rule("status_ok", col("status") === "ok"))

  test("audit counts violations per rule; NULL counts as violation") {
    val a = Expectations.audit(df, rules).orderBy("rule").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("positive", 3L, 5L), ("status_ok", 2L, 5L)))
  }

  test("split: clean keeps original schema, quarantine carries failed-rule names") {
    val s = Expectations.split(df, rules)
    try {
      assert(s.clean.columns.toSeq == Seq("id", "amount", "status"))
      assert(s.clean.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
      val q = s.quarantined.orderBy("id")
        .select(col("id"), col("_violations")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      assert(q == Map(
        2L -> Set("positive"), 3L -> Set("positive"),
        4L -> Set("status_ok"), 5L -> Set("positive", "status_ok")))
    } finally s.release()
  }

  test("audit over an empty input reports 0 violations per rule, not NULL") {
    val a = Expectations.audit(df.where(col("id") < 0L), rules)
      .orderBy("rule").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("positive", 0L, 0L), ("status_ok", 0L, 0L)))
  }

  test("enforce throws with per-rule counts; passes on clean data") {
    val e = intercept[IllegalStateException] { Expectations.enforce(df, rules) }
    assert(e.getMessage.contains("positive=3") && e.getMessage.contains("status_ok=2"))
    Expectations.enforce(df.where(col("id") === 1L), rules) // no throw
  }
}
