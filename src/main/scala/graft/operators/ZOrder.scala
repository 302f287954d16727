package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Z-order (Morton) data clustering for write-time layout optimization.
  *
  * A single-column sort gives min-max pruning on ONE column; interleaving
  * the bits of two key columns gives a 1-D sort key that preserves 2-D
  * locality, so every written file covers a small bounding *box* in both
  * dimensions — a stats-aware reader (parquet row-group min/max, Delta/
  * Iceberg file stats) then skips data for predicates on EITHER column.
  * At 100 TB this is the difference between scanning one dimension's worth
  * of files and scanning a tile.
  *
  * The z-value is a plain codegen'd expression (shift/mask/add per bit) —
  * no UDF, no shuffle beyond the one range-partition the clustered write
  * needs anyway.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit b of x lands at position 2b, bit b of y at 2b+1.
    * Inputs must already be normalized to [0, 2^bits) — interleaving RAW
    * values is wrong when the dimensions span different ranges (the wider
    * dimension's high bits dominate and the curve degenerates to a linear
    * sort on it).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** N-dimensional Morton interleave: bit b of dimension i lands at
    * position b·k + i (k = number of dimensions). k·bits must fit a long.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 2, s"need at least 2 dimensions, got $k")
    require(bits >= 1 && k * bits <= 62, s"k*bits must be in [2,62]: $k*$bits")
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftright(c.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (b * k + i))
      }
    }.reduce(_ + _)
  }

  /** Min-max normalize an integer column to [0, 2^bits) buckets. Linear
    * scaling equalizes RANGES; for heavily skewed value distributions a
    * rank-based normalization (range-partition ids, as Delta's OPTIMIZE
    * ZORDER uses) would replace this — same interleave on top.
    *
    * Arithmetic: the offset is computed in decimal(38,0) — `c - minV` in
    * LongType would wrap for wide-range columns (epoch-micro timestamps,
    * or minV near Long.MinValue) — then scaled in double. A bucket index
    * needs ≤ 31 significant bits (zValueN caps k·bits ≤ 62), far inside
    * double's 53, and the top bucket is clamped so boundary rounding can
    * never produce 2^bits (which the interleave would silently truncate
    * to bucket 0, putting the max value next to the min).
    */
  def normalize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"empty range: [$minV, $maxV]")
    val range = BigDecimal(maxV) - BigDecimal(minV) + 1 // exact; may exceed Long
    val offset = (c.cast(DecimalType(38, 0)) -
      lit(java.math.BigDecimal.valueOf(minV))).cast("double")
    least(floor(offset * (1L << bits).toDouble / range.toDouble),
      lit((1L << bits) - 1)).cast("long")
  }

  /** Write `df` as parquet clustered by z(xCol, yCol): normalize both
    * dimensions (one cheap min/max pass — at scale these come from table
    * stats), range-partition on the z-value into `nFiles` files, sort
    * within each, drop the helper column. Range partition + in-partition
    * sort = global z-order across the file set.
    */
  def writeClustered(df: DataFrame, path: String, xCol: String, yCol: String,
      nFiles: Int, bits: Int = 8): Unit =
    cluster(df, xCol, yCol, nFiles, bits).write.mode("overwrite").parquet(path)

  /** The clustering transform alone — returns `df` range-partitioned and
    * sorted on z(xCol, yCol), ready for ANY sink (plain parquet via
    * [[writeClustered]], or a [[graft.sources.VersionedStore]] snapshot,
    * where the tight per-file x/y ranges make the exported log's
    * per-file stats maximally selective on BOTH dimensions).
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, bits: Int = 8): DataFrame = {
    val r = df.agg(
      min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).head
    val (xmin, xmax, ymin, ymax) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val taken = df.columns.toSet
    val cZ = Iterator.from(0).map(i => s"_z${if (i == 0) "" else s"_$i"}")
      .find(!taken.contains(_)).get
    df.withColumn(cZ, zValue(
        normalize(col(xCol), xmin, xmax, bits),
        normalize(col(yCol), ymin, ymax, bits), bits))
      .repartitionByRange(nFiles, col(cZ))
      .sortWithinPartitions(cZ)
      .drop(cZ)
  }
}
