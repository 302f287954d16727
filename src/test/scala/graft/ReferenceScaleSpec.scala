package graft

import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CoolingPipeline, PaymentsGenerator, Watermark}
import graft.sources.{ColdStore, ParquetPaymentsSource}

/** Full reference scale: the exact scenario of
  * /root/reference/img/YQ_Federation_Query.png — 61 generated months
  * (2020-01 … 2025-01, 2,675,520 rows, one per minute), three cooling runs,
  * then the federation analytics query must reproduce the golden 6-row
  * grid byte for byte:
  *
  *   (2020,s3,527040) (2021,s3,525600) (2022,s3,525600)
  *   (2023,pg,525600) (2024,pg,527040) (2025,pg,44640)
  */
class ReferenceScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("61-month corpus, 3 cooling runs, golden federation grid (img/YQ_Federation_Query.png)") {
    val root = Files.createTempDirectory("graft-refscale").toString
    PaymentsGenerator.writeHotStore(spark, s"$root/hot", "2020-01-01", months = 61)
    val wm = new Watermark(s"$root/wm.json")
    wm.initIfAbsent(LocalDate.parse("2020-01-01"))
    val p = new CoolingPipeline(
      new ParquetPaymentsSource(s"$root/hot"), new ColdStore(s"$root/cold"), wm)

    assert(p.source.scan(spark).count() == 2675520L) // total golden rows

    val t0 = System.nanoTime()
    val runs = (1 to 3).map(_ => p.runOnce(spark))
    val coolSecs = (System.nanoTime() - t0) / 1e9

    assert(runs.map(r => (r._1, r._2, r._3)) == Seq(
      (2020, 527040L, 0L), (2021, 525600L, 0L), (2022, 525600L, 0L)))

    val t1 = System.nanoTime()
    val fed = p.federationAnalytics(spark).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val fedSecs = (System.nanoTime() - t1) / 1e9

    assert(fed == Seq(
      (2020, "s3", 527040L), (2021, "s3", 525600L), (2022, "s3", 525600L),
      (2023, "pg", 525600L), (2024, "pg", 527040L), (2025, "pg", 44640L)))

    info(f"cooled 3 years in $coolSecs%.1f s; federation query over 2.68M rows in $fedSecs%.2f s " +
      f"(reference record: 3 s — img/YQ_Federation_Query.png)")
    assert(fedSecs < 6.0, "federation query should beat 2x the reference's 3 s record")
  }
}
