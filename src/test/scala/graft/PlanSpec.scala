package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{JoinQueries, ReferenceQueries}

/** Plan-hygiene assertions (SURVEY.md §4): the optimizations we rely on at
  * 100 TB must be visible in the executed plan, not assumed — filter
  * pushdown to the parquet scan, column pruning, broadcast dim joins, and
  * whole-stage codegen in the hot paths.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 export: window filter is pushed to the parquet scan") {
    val plan = planOf(ReferenceQueries.q1ExportProject(spark, dir))
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") || plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"expected o_orderdate pushdown in:\n$plan")
  }

  test("j1 revenue: dims broadcast, fact columns pruned") {
    val df = JoinQueries.j1RevenueByNation(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"dims should broadcast in:\n$plan")
    // lineitem scan must read only orderkey + price + discount
    val liScan = plan.linesIterator.filter(l => l.contains("lineitem.parquet")).mkString("\n")
    assert(!liScan.contains("l_shipdate") && !liScan.contains("l_returnflag"),
      s"lineitem scan should be pruned to 3 columns:\n$liScan")
  }

  test("j2 top parts: partial aggregation precedes the dim join") {
    val plan = planOf(JoinQueries.j2TopParts(spark, dir))
    // partial_sum before final: two HashAggregates around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("TakeOrderedAndProject"), "limit+sort should fuse into top-k")
  }

  test("whole-stage codegen covers the export hot path (unwrap included)") {
    val df = ReferenceQueries.q1ExportProject(spark, dir)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    assert(plan.contains("*("), s"expected codegen stage markers in:\n$plan") // codegen'd stages
    // unwrap is our custom expression — the projection containing it must be
    // inside a codegen stage (prefix *(n)), not an interpreted Project
    val projLine = plan.linesIterator.find(_.contains("unwrap(")).getOrElse("")
    assert(projLine.contains("*("), s"unwrap projection fell out of codegen: $projLine")
  }

  test("exclusion join composes two anti joins sharing the key partitioning") {
    val plan = planOf(ReferenceQueries.q2ExclusionJoin(spark, dir))
    assert("LeftAnti".r.findAllIn(plan).size == 2, s"expected two anti joins in:\n$plan")
  }

  test("global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val plan = planOf(JoinQueries.j7ShippingPriority(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k, not a global sort, in:\n$plan")
  }

  test("runtime bloom-filter pruning injects on a selective fact-dim shuffle join") {
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join, where the filter pays
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // selective dim (1 of ~1500 orders) joined to the full fact table:
      // the optimizer should build a bloom filter on the dim side and
      // apply it to the lineitem scan BEFORE the shuffle — at 100 TB this
      // is the difference between shuffling the whole fact table and
      // shuffling the matching sliver
      val dim = graft.sources.Tables.orders(spark, dir)
        .where(col("o_orderpriority") === "1-URGENT" && col("o_custkey") % 100 === 0)
        .select(col("o_orderkey"))
      val fact = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter on the fact scan in:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
