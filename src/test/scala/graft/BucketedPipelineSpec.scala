package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExclusionJoin
import graft.pipeline.{CoolingPipeline, PaymentsGenerator, Watermark}
import graft.sources.{BucketedColdStore, BucketedHotStore}

/** End-to-end cooling cycle over the year-co-bucketed store layout — the
  * lake-to-lake 100 TB deployment where the reconcile gate's shuffle was
  * paid at write time. Asserts the pipeline DETECTS the layout (takes
  * [[ExclusionJoin.countBucketed]]), that the gate's plan moves zero data
  * through an Exchange, and that the full cool→reconcile→drop→watermark
  * cycle reaches the same end state as the path-based pipeline.
  */
class BucketedPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val root = Files.createTempDirectory("graft-bpipe").toString
  private val wmPath = s"$root/watermark.json"
  private val Buckets = 4

  private lazy val fixture: CoolingPipeline = {
    val hot = new BucketedHotStore("bhot", Buckets)
    val all = PaymentsGenerator.payments(spark, "2020-01-01", months = 24)
    Seq(2020, 2021).foreach { y =>
      hot.loadYear(all.where(year(col("payment_date")) === y), y)
    }
    val wm = new Watermark(wmPath)
    wm.initIfAbsent(LocalDate.parse("2020-01-01"))
    new CoolingPipeline(hot, new BucketedColdStore("bcold", Buckets), wm)
  }

  test("layout detection: whole-year window over co-bucketed stores takes the bucketed gate") {
    val p = fixture
    val s = LocalDate.parse("2020-01-01")
    // cold side not exported yet — no pair, the shuffle plan is the default
    assert(p.bucketedPair(spark, s, s.plusYears(1)).isEmpty)
    p.cold.exportYear(p.exportFrame(spark, s, s.plusYears(1)))
    assert(p.bucketedPair(spark, s, s.plusYears(1))
      .contains(("bhot_payments_y2020", "bcold_payments_y2020")))
    // a partial-year window must NOT trust the year tables
    assert(p.bucketedPair(spark, s, s.plusMonths(6)).isEmpty)
  }

  test("the gate's plan: bucketed scans, zero data Exchange") {
    val p = fixture
    val Some((hotT, coldT)) =
      p.bucketedPair(spark, LocalDate.parse("2020-01-01"), LocalDate.parse("2021-01-01"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoPart = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val frame = ExclusionJoin.countFrame(
        spark.table(hotT), spark.table(coldT), p.reconcileKeys)
      assert(frame.head.getLong(0) == 0L)
      val plan = frame.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed gate must not shuffle data:\n$plan")
      assert(plan.contains("Bucketed: true"), s"gate must scan bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevCoPart)
    }
  }

  test("corruption is still caught through the bucketed gate") {
    val p = fixture
    val s = LocalDate.parse("2020-01-01"); val e = LocalDate.parse("2021-01-01")
    // a dropped row on the cold side (the export re-derives from hot, so
    // the corrupted copy is built from the hot side too)
    p.cold.exportYear(p.exportFrame(spark, s, e).where(col("id") =!= 42L))
    assert(p.reconcile(spark, s, e) == 1L)
    // restore the faithful copy (writeBucketed re-derives from the hot side)
    p.cold.exportYear(p.exportFrame(spark, s, e))
    assert(p.reconcile(spark, s, e) == 0L)
  }

  test("full cycle: both years cooled, hot year tables dropped, watermark advanced") {
    val p = fixture
    val runs = p.runAll(spark)
    assert(runs.map(_._1) == Seq(2020, 2021))
    assert(runs.map(_._3) == Seq(0L, 0L))
    assert(runs.head._2 == 527040L) // leap-year golden count (img/YQ_Federation_Query.png)
    assert(runs(1)._2 == 525600L)
    assert(!spark.catalog.tableExists("bhot_payments_y2020"))
    assert(!spark.catalog.tableExists("bhot_payments_y2021"))
    assert(p.cold.years(spark) == Seq(2020, 2021))
    assert(new Watermark(wmPath).value == LocalDate.parse("2022-01-01"))
    // the federation query still unions both stores (hot side now empty)
    val fed = p.federationAnalytics(spark).collect()
    assert(fed.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((2020, "s3", 527040L), (2021, "s3", 525600L)))
  }
}
