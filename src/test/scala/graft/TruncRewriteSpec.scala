package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.YqlTextQueries

/** TruncationComparisonRewrite: YQL-style `date_trunc` filters must reach
  * the parquet scan as pushed filters, with exact boundary semantics and
  * no rewrite for non-aligned literals.
  */
class TruncRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("y1's translated YQL filter is pushed to the scan") {
    val plan = YqlTextQueries.y1YqlProject(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      s"expected pushed o_orderdate bounds:\n${plan.take(3000)}")
    // the projection keeps date_trunc (it IS the output value); only the
    // filter must be unwrapped — visible as raw-column DataFilters
    assert(plan.contains("DataFilters: [isnotnull(o_orderdate"),
      "the filter condition should compare the raw column")
  }

  test("boundary semantics survive the rewrite exactly (sub-second rows)") {
    import spark.implicits._
    val rows = Seq(
      "2020-06-01 11:59:59.400",   // trunc 11:59:59  -> excluded by >= 12:00:00
      "2020-06-01 11:59:59.999",   // trunc 11:59:59  -> excluded
      "2020-06-01 12:00:00.000",   // trunc 12:00:00  -> included
      "2020-06-01 12:00:00.700",   // trunc 12:00:00  -> included
      "2020-06-01 12:59:59.999",   // trunc 12:59:59  -> included by < 13:00:00
      "2020-06-01 13:00:00.000"    // trunc 13:00:00  -> excluded
    ).map(java.sql.Timestamp.valueOf).toDF("ts")
    val got = rows.where(
      date_trunc("SECOND", col("ts")) >= lit("2020-06-01 12:00:00").cast("timestamp") &&
      date_trunc("SECOND", col("ts")) < lit("2020-06-01 13:00:00").cast("timestamp"))
      .count()
    assert(got == 3L)
    // equality expands to the unit range
    val eq = rows.where(
      date_trunc("SECOND", col("ts")) === lit("2020-06-01 12:00:00").cast("timestamp")).count()
    assert(eq == 2L)
  }

  test("non-aligned literal is NOT rewritten (equivalence would not hold)") {
    import spark.implicits._
    // parquet-backed so the optimizer can't constant-fold the filter away
    val aligned = sources.Tables.orders(spark, dir)
      .where(date_trunc("SECOND", col("o_orderdate").cast("timestamp")) >=
        lit("1996-01-01 00:00:00").cast("timestamp"))
    assert(!aligned.queryExecution.optimizedPlan.toString.contains("date_trunc"))

    val nonAligned = sources.Tables.orders(spark, dir)
      .where(date_trunc("SECOND", col("o_orderdate").cast("timestamp")) >=
        lit("1996-01-01 00:00:00.5").cast("timestamp"))
    val cond = nonAligned.queryExecution.optimizedPlan.toString
    assert(cond.contains("date_trunc"), s"non-aligned bound must keep the trunc:\n$cond")

    // semantics stay truncation semantics: trunc drops sub-second parts, so
    // a .5 bound admits exactly the rows a whole-second >= 00:00:01 bound does
    val wantCount = sources.Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01 00:00:01").cast("timestamp")).count()
    assert(nonAligned.count() == wantCount)
  }
}
