package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** ZOrder: the clustered layout must (a) preserve the data exactly and
  * (b) let a stats-aware reader skip files on predicates over EITHER
  * dimension. The honest metric is file-level min/max overlap: for a
  * point predicate on one column, how many files' [min,max] ranges must
  * be opened. A linear sort on x answers x-predicates with ~1 file but
  * every y-predicate touches ALL files; z-order answers both dimensions
  * with a fraction of the file set.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.01"
  private val nFiles = 32

  /** Per-file [min,max] of a column across the written layout. */
  private def fileRanges(path: String, c: String): Array[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c).cast("long")).as("lo"), max(col(c).cast("long")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

  /** Mean number of files a point predicate `c = v` must open. */
  private def meanFilesTouched(path: String, c: String, values: Seq[Long]): Double = {
    val ranges = fileRanges(path, c)
    values.map(v => ranges.count { case (lo, hi) => lo <= v && v <= hi }).sum.toDouble / values.size
  }

  test("z-order serves point predicates on both dimensions from a file subset") {
    val root = Files.createTempDirectory("graft-zorder").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

    ZOrder.writeClustered(li, s"$root/z", "l_partkey", "l_suppkey", nFiles)
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$root/linear")

    // correctness: the clustered copy is the same multiset of rows
    val a = spark.read.parquet(s"$root/z")
    assert(a.count() == li.count())
    assert(a.exceptAll(li).isEmpty && li.exceptAll(a).isEmpty)

    // probe values evenly spaced inside each column's actual range, so
    // every probe hits real data on both layouts
    def probes(c: String): Seq[Long] = {
      val r = li.agg(min(col(c).cast("long")), max(col(c).cast("long"))).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      (0 until 5).map(i => lo + (hi - lo) * i / 4)
    }
    val parts = probes("l_partkey")
    val supps = probes("l_suppkey")
    val zCost = meanFilesTouched(s"$root/z", "l_partkey", parts) +
      meanFilesTouched(s"$root/z", "l_suppkey", supps)
    val linCost = meanFilesTouched(s"$root/linear", "l_partkey", parts) +
      meanFilesTouched(s"$root/linear", "l_suppkey", supps)
    // linear: ~1 + all 32; z: a fraction of 32 on each axis
    assert(zCost < linCost * 0.6,
      s"z layout touches $zCost files (x+y point lookups), linear $linCost")
  }

  test("wide-range dimensions (epoch-micros) still cluster — no long wrap") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-zwide").toString
    // epoch-microsecond timestamps spanning ~50 years: range ≈ 1.6e15 > 2^50,
    // so the old (c-min)*2^bits LongType multiply wrapped and destroyed the
    // clustering. 10k rows, second dim a plain key.
    val base = 946684800000000L // 2000-01-01 in micros
    val df = (0 until 10000).map { i =>
      (base + i.toLong * 157766400000L, (i * 37 % 1000).toLong, i.toLong)
    }.toDF("ts_us", "key", "payload")

    ZOrder.writeClustered(df, s"$root/z", "ts_us", "key", nFiles = 16, bits = 8)

    val a = spark.read.parquet(s"$root/z")
    assert(a.count() == 10000)
    assert(a.exceptAll(df).isEmpty && df.exceptAll(a).isEmpty)

    // normalize itself: monotone, in-range, max lands in the top bucket
    val (tmin, tmax) = (base, base + 9999L * 157766400000L)
    val buckets = df.select(ZOrder.normalize(col("ts_us"), tmin, tmax, 8).as("b"))
      .agg(min("b"), max("b")).head
    assert(buckets.getLong(0) == 0L && buckets.getLong(1) == 255L,
      s"buckets span [${buckets.getLong(0)}, ${buckets.getLong(1)}], want [0, 255]")

    // file skipping works on BOTH dimensions despite the wide range
    val tsProbes = (0 until 5).map(i => tmin + (tmax - tmin) * i / 4)
    val keyProbes = Seq(0L, 250L, 500L, 750L, 999L)
    val tsCost = meanFilesTouched(s"$root/z", "ts_us", tsProbes)
    val keyCost = meanFilesTouched(s"$root/z", "key", keyProbes)
    assert(tsCost < 8 && keyCost < 8,
      s"point lookups touch ts=$tsCost key=$keyCost of 16 files — clustering lost")
  }

  test("z-value interleaves bits correctly") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3): x bits at even positions → 1+16, y bits at
    // odd positions → 2+8; z = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 3).as("z"))
      .head.getLong(0)
    assert(z == 27L)
  }

  test("n-dim z-value: 3-way interleave puts bit b of dim i at position 3b+i") {
    import spark.implicits._
    // x=1 (bit0), y=1 (bit0), z=1 (bit0) → positions 0,1,2 → 0b111 = 7
    // x=2 (bit1) alone → position 3 → 8
    val r = Seq((1L, 1L, 1L), (2L, 0L, 0L)).toDF("x", "y", "w")
      .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(r.toSeq == Seq(7L, 8L))
  }
}
