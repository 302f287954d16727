package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleJoins
import graft.sources.Tables

/** Scale-join techniques: bucketed tables join WITHOUT a shuffle (the
  * exchange is paid once at write time), and salting preserves join
  * results while splitting skewed keys.
  */
class ScaleJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs shuffle-free") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to expose exchanges
    try {
      ScaleJoins.writeBucketed(
        Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_orderkey", 4)
      ScaleJoins.writeBucketed(
        Tables.lineitem(spark, dir).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 4)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      assert(joined.count() == 6000L) // every lineitem row matches its order
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join == plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 7L, i)).toDF("k", "payload")
    val right = (1L to 1000L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = left.join(right, "k").select("k", "payload", "dim").collect().sortBy(r => (r.getLong(0), r.getInt(1)))
    val salted = ScaleJoins.saltedJoin(left, right, "k").select("k", "payload", "dim")
      .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }
}
