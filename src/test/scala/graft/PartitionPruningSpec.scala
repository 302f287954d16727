package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CoolingPipeline, PaymentsGenerator, Watermark}
import graft.sources.{ColdStore, ParquetPaymentsSource}

/** PartitionYearPruningRule: a payment_date window on the cold store must
  * prune to the covered payment_year partitions — and change nothing else.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val cold: ColdStore = {
    val root = Files.createTempDirectory("graft-prune").toString
    PaymentsGenerator.writeHotStore(spark, s"$root/hot", "2020-01-01", months = 25) // 2020,2021,2022-01
    val wm = new Watermark(s"$root/wm.json")
    wm.initIfAbsent(LocalDate.parse("2020-01-01"))
    val p = new CoolingPipeline(new ParquetPaymentsSource(s"$root/hot"), new ColdStore(s"$root/cold"), wm)
    p.runOnce(spark); p.runOnce(spark); p.runOnce(spark)
    p.cold
  }

  /** Just the `PartitionFilters: [...]` segments, not whole FileScan lines
    * (those also list `payment_year` as an output column).
    */
  private def partitionFilters(plan: String): String =
    "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan).mkString("; ")

  private def windowed = cold.scan(spark)
    .filter(col("payment_date") >= lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")) &&
      col("payment_date") < lit(java.sql.Timestamp.valueOf("2022-01-01 00:00:00")))

  test("date-window filter on the cold store prunes to one payment_year partition") {
    val df = windowed
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(scanLine.contains("payment_year"), s"expected payment_year partition filter in:\n$plan")
    // one partition dir read, not three
    val filesRead = df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val allFiles = { val d = cold.scan(spark); d.collect(); d.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum }
    assert(filesRead < allFiles, s"pruned scan read $filesRead files, full scan $allFiles")
  }

  test("pruning preserves results exactly") {
    assert(windowed.count() == 525600L) // 2021, common year
    // the derived predicate must not fire when payment_year is already constrained
    val explicit = cold.scan(spark).filter(col("payment_year") === 2021)
    assert(explicit.count() == 525600L)
  }

  test("date bounds under OR must NOT derive a year range (regression: disjunct drop)") {
    val win = col("payment_date") >= lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")) &&
      col("payment_date") < lit(java.sql.Timestamp.valueOf("2022-01-01 00:00:00"))
    val orFilter = cold.scan(spark).filter(win || col("amount") > lit(500.0))
    // oracle decomposition: window rows + high-amount rows outside the window
    // (neither branch lets the rule harvest bounds: the first has no amount
    // disjunct, the second has payment_date only under NOT)
    val inWin = cold.scan(spark).filter(win).count()
    val outHi = cold.scan(spark).filter(!win && col("amount") > lit(500.0)).count()
    assert(orFilter.count() == inWin + outHi,
      s"OR-filter dropped rows: got ${orFilter.count()}, expected ${inWin + outHi}")
    // and the plan must not contain a derived payment_year partition filter
    orFilter.collect()
    val planStr = orFilter.queryExecution.executedPlan.toString
    val pf = partitionFilters(planStr)
    assert(!pf.contains("payment_year"), s"unsound derived partition filter in: $pf")
  }

  test("date bounds in a conjunct alongside an OR conjunct still prune (sound case)") {
    val win = col("payment_date") >= lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")) &&
      col("payment_date") < lit(java.sql.Timestamp.valueOf("2022-01-01 00:00:00"))
    // cond = window AND (amount > 500 OR state = 'x'): window is a top-level
    // conjunct, so the year range is implied and pruning is sound
    val df = cold.scan(spark).filter(win && (col("amount") > lit(500.0) || col("state") === "x"))
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    val pf = partitionFilters(planStr)
    assert(pf.contains("payment_year"), s"expected payment_year pruning in:\n$planStr")
    val oracle = cold.scan(spark).filter(col("payment_year") === 2021)
      .filter(col("amount") > lit(500.0) || col("state") === "x").count()
    assert(df.count() == oracle)
  }
}
