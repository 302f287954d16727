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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep it a shuffle join
      // shrink thresholds so the hot key trips skew handling on test-size data
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // ~100k rows on one hot key vs 1k spread keys
      val left = spark.range(0, 101000)
        .select(when(col("id") < 100000L, 7L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 102000).select(col("id").as("k"), md5(col("id").cast("string")).as("dim"))
      val joined = left.join(right, "k")
      // materialize THIS plan (count() would execute a separate agg plan
      // and leave joined's own AdaptiveSparkPlan unfinalized)
      assert(joined.collect().length == 101000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE OptimizeSkewedJoin to mark the join:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
