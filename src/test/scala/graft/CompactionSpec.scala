package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Compaction: many tiny files → few target-sized files, bit-identical
  * data, original left intact on failure paths.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("compaction merges tiny files and preserves the data exactly") {
    val dir = s"${Files.createTempDirectory("graft-compact")}/t"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.repartition(64).write.parquet(dir) // simulate micro-batch litter

    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length == 64)

    val r = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(r.filesBefore == 64)
    assert(r.filesAfter < 8, s"expected <8 files after compaction, got ${r.filesAfter}")

    val after = spark.read.parquet(dir)
    assert(after.count() == li.count())
    assert(after.exceptAll(li).isEmpty && li.exceptAll(after).isEmpty)
    // no leftover working directories
    assert(!graft.sources.FsUtil.exists(spark, s"$dir.compact-tmp"))
    assert(!graft.sources.FsUtil.exists(spark, s"$dir.compact-old"))
  }

  test("ignoreCorruptFiles skips junk files a crashed writer left behind") {
    val dir = s"${Files.createTempDirectory("graft-corrupt")}/t"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.write.parquet(dir)
    Files.write(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      "this is not parquet".getBytes)

    val saved = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir).count() == li.count())
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
      intercept[Exception] {
        // footer read fails fast at planning or execution — either way the
        // strict mode must refuse to silently skip data
        spark.read.parquet(dir).count()
      }
    } finally saved.fold(spark.conf.unset("spark.sql.files.ignoreCorruptFiles"))(
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", _))
  }

  test("schema evolution: mergeSchema unions partitions written with drifted schemas") {
    val root = s"${Files.createTempDirectory("graft-drift")}/t"
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/payment_year=2020")
    Seq((2L, "b", 9.5)).toDF("id", "v", "extra").write.parquet(s"$root/payment_year=2021")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
      .orderBy("id")
    assert(merged.columns.toSet == Set("id", "v", "extra", "payment_year"))
    val rows = merged.select("id", "extra").collect()
    assert(rows(0).isNullAt(1)) // old partition: drifted column null-filled
    assert(rows(1).getDouble(1) == 9.5)
  }
}
