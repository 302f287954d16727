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

  test("crash between the swap renames is recovered on re-entry") {
    val dir = s"${Files.createTempDirectory("graft-crash")}/t"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.repartition(16).write.parquet(dir)

    // Simulate a crash after rename(dir, bak) but before rename(tmp, dir):
    // the data dir is GONE and the original sits at .compact-old.
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(s"$dir.compact-old")))
    assert(!fs.exists(p))

    // Re-running compact must first restore the original, then compact it.
    val r = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(r.filesBefore == 16)
    val after = spark.read.parquet(dir)
    assert(after.count() == li.count())
    assert(after.exceptAll(li).isEmpty && li.exceptAll(after).isEmpty)
    assert(!graft.sources.FsUtil.exists(spark, s"$dir.compact-old"))
    assert(!graft.sources.FsUtil.exists(spark, s"$dir.compact-tmp"))
  }

  test("stale .compact-old after a completed swap is cleaned, not restored") {
    val dir = s"${Files.createTempDirectory("graft-stale")}/t"
    import spark.implicits._
    Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    // crash after swap completed: both dir (new data) and bak (old) exist
    Seq((999L, "OLD")).toDF("id", "v").write.parquet(s"$dir.compact-old")

    Compaction.compact(spark, dir)
    val after = spark.read.parquet(dir)
    assert(after.count() == 100) // the stale bak was deleted, not swapped back
    assert(!graft.sources.FsUtil.exists(spark, s"$dir.compact-old"))
  }

  test("hive-partitioned input is compacted per leaf, layout preserved") {
    val dir = s"${Files.createTempDirectory("graft-part")}/t"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.withColumn("ry", col("l_returnflag"))
      .repartition(16)
      .write.partitionBy("ry").parquet(dir)

    val before = spark.read.parquet(dir)
    val beforeCount = before.count()
    assert(before.inputFiles.length > 8)

    val r = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(r.filesBefore > r.filesAfter)

    val after = spark.read.parquet(dir)
    assert(after.columns.contains("ry"), "partition column must survive")
    assert(after.count() == beforeCount)
    // layout intact on disk: only key=value subdirs, each holding parquet
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subdirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("ry=")), subdirs.mkString(","))
    // and pruning to one partition returns exactly that partition's rows
    assert(after.where(col("ry") === "R").count() ==
      li.where(col("l_returnflag") === "R").count())
  }

  test("non-partition subdirectories are rejected, data untouched") {
    val dir = s"${Files.createTempDirectory("graft-mixed")}/t"
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/notapartition")
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir)
    }
    assert(spark.read.parquet(s"$dir/notapartition").count() == 1)
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
