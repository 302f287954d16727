package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Runtime bloom-filter injection (`InjectRuntimeFilter`) — the 100 TB
  * scan-reduction lever for selective fact⋈dim shuffle joins: Spark builds
  * a bloom filter over the dim side's join keys at runtime and pushes
  * `might_contain` onto the fact scan, discarding non-matching fact rows
  * before the shuffle. At test scale the fact side is far below the
  * production `applicationSideScanSizeThreshold` (10 GB), so we lower the
  * thresholds to emulate the size regime where the optimizer fires —
  * asserting the MECHANISM our plans rely on at 100× is actually wired.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def factDimJoin = {
    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
  }

  test("selective dim join injects might_contain on the fact side in the big-fact regime") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = factDimJoin.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
    }
  }

  test("bloom-filtered result == unfiltered result (the filter is sound)") {
    val want = factDimJoin.orderBy("c_nationkey").collect()
    val got = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      factDimJoin.orderBy("c_nationkey").collect()
    }
    assert(got.sameElements(want))
  }
}
