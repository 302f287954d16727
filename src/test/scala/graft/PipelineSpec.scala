package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CoolingPipeline, PaymentsGenerator, Watermark}
import graft.sources.{ColdStore, FsUtil, ParquetPaymentsSource}

/** End-to-end test of the cooling pipeline at mini scale (SURVEY.md §5.2):
  * 13 generated months (2020 full leap year + 2021-01), cooled year by
  * year, with the reference's golden per-year cardinalities
  * (img/YQ_Federation_Query.png: 527,040 rows for a leap year, 44,640 for
  * one 31-day month) and the negative tests of FIXTURES.md §A5.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val root = Files.createTempDirectory("graft-pipeline").toString
  private val hotBase = s"$root/hot"
  private val coldBase = s"$root/cold"
  private val wmPath = s"$root/watermark.json"

  private lazy val fixture: CoolingPipeline = {
    PaymentsGenerator.writeHotStore(spark, hotBase, "2020-01-01", months = 13)
    val wm = new Watermark(wmPath)
    wm.initIfAbsent(LocalDate.parse("2020-01-01"))
    new CoolingPipeline(new ParquetPaymentsSource(hotBase), new ColdStore(coldBase), wm)
  }

  test("hot store generates the reference's partition layout and cardinality") {
    val p = fixture
    val src = new ParquetPaymentsSource(hotBase)
    val parts = src.listPartitions(spark, "payments_y")
    assert(parts.size == 13 && parts.head == "payments_y2020m01" && parts.last == "payments_y2021m01")
    assert(src.scan(spark).count() == 527040L + 44640L) // leap 2020 + Jan 2021
  }

  test("run 1 cools the leap year: golden count, reconcile 0, source dropped, watermark advanced") {
    val p = fixture
    val (year, exported, diff) = p.runOnce(spark)
    assert(year == 2020 && diff == 0L)
    assert(exported == 527040L) // img/YQ_Federation_Query.png leap-year row
    assert(FsUtil.listDir(spark, hotBase).forall(!_.startsWith("pmonth=y2020")))
    assert(new Watermark(wmPath).value == LocalDate.parse("2021-01-01"))
    // export is second-truncated and partition-pruned on disk
    assert(FsUtil.exists(spark, s"$coldBase/payment_year=2020"))
  }

  test("idempotent re-export: overwriting the same year keeps reconcile at 0 and no duplicates") {
    val p = fixture
    // simulate crash after export, before drop: re-run the export of 2021
    val s = LocalDate.parse("2021-01-01"); val e = LocalDate.parse("2022-01-01")
    p.cold.exportYear(p.exportFrame(spark, s, e))
    p.cold.exportYear(p.exportFrame(spark, s, e)) // second time — dynamic overwrite
    assert(p.reconcile(spark, s, e) == 0L)
    assert(p.cold.scan(spark).where(col("payment_year") === 2021).count() == 44640L)
  }

  test("negative: corrupted copies are caught by reconciliation (drop/dup/amount-bit)") {
    val p = fixture
    val s = LocalDate.parse("2021-01-01"); val e = LocalDate.parse("2022-01-01")
    val good = p.exportFrame(spark, s, e)

    def reconcileWith(coldDf: DataFrame): Long = {
      p.cold.exportYear(coldDf)
      p.reconcile(spark, s, e)
    }
    // drop one row
    assert(reconcileWith(good.where(col("id") =!= 527041L)) == 1L)
    // duplicate one row
    assert(reconcileWith(good.unionAll(good.where(col("id") === 527041L))) == 1L)
    // flip one amount's low bits — DOUBLE is part of the join key
    val flipped = good.withColumn("amount",
      when(col("id") === 527042L, col("amount") + lit(1e-9)).otherwise(col("amount")))
    assert(reconcileWith(flipped) == 2L) // unmatched on both sides
    // restore the faithful copy for subsequent tests
    assert(reconcileWith(good) == 0L)
  }

  test("run 2 cools the partial month; federation analytics reproduces the golden distribution") {
    val p = fixture
    val (year, exported, diff) = p.runOnce(spark)
    assert(year == 2021 && exported == 44640L && diff == 0L)
    val fed = p.federationAnalytics(spark).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(fed == Seq((2020, "s3", 527040L), (2021, "s3", 44640L)))
    assert(new Watermark(wmPath).value == LocalDate.parse("2022-01-01"))
    // runAll on the exhausted store is a no-op
    assert(p.runAll(spark).isEmpty)
  }

  test("exported parquet carries second-truncated timestamps and non-nullable id") {
    val p = fixture
    val cold = p.cold.scan(spark)
    val withSubSecond =
      cold.where(col("payment_date") =!= date_trunc("second", col("payment_date"))).count()
    assert(withSubSecond == 0L)
    assert(p.cold.schema("id").nullable == false)
  }
}
