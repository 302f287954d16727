package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval (range) join: for each left row, the right rows of the
  * same key whose timestamp falls in `[leftTs + lower, leftTs + upper)`.
  *
  * Spark has no native range-join strategy; the naive formulation
  * `left.join(right, key && band)` degenerates to a broadcast-nested-loop
  * or a per-key cross product. The scalable composition used here is time
  * bucketing: with bucket width = band width, a left row's band overlaps at
  * most TWO buckets, so the left side replicates ≤2× into (key, bucket)
  * while each right row lands in exactly one bucket — the join becomes a
  * plain equi-join on (key, bucket) (hash-partitionable, AQE-skew-
  * splittable) followed by the exact band filter. Shuffle volume is
  * 2·|L| + |R| rows instead of a cross product — the standard interval-join
  * plan in stream processors, expressed with stock Catalyst operators.
  */
object RangeJoin {

  /** @param left    probe rows
    * @param right   rows to match into each probe's band
    * @param key     equi-key column name (both sides)
    * @param leftTs  timestamp column on `left`
    * @param rightTs timestamp column on `right` (name must differ from leftTs)
    * @param lowerUs band start offset vs leftTs, microseconds (inclusive)
    * @param upperUs band end offset vs leftTs, microseconds (exclusive)
    * @return matched pairs: all left columns + all right columns (other
    *         column names must be disjoint across sides, as in any join)
    */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, s"empty band: [$lowerUs, $upperUs)")
    val widthUs = upperUs - lowerUs
    val taken = (left.columns ++ right.columns).toSet
    val cB = Iterator.from(0).map(i => s"_bucket${if (i == 0) "" else s"_$i"}")
      .find(!taken.contains(_)).get

    val lo = unix_micros(col(leftTs)) + lit(lowerUs)
    val hi = unix_micros(col(leftTs)) + lit(upperUs) - lit(1L)
    val l = left.withColumn(cB,
      explode(array_distinct(array(floor_div(lo, widthUs), floor_div(hi, widthUs)))))
    val r = right.withColumn(cB, floor_div(unix_micros(col(rightTs)), widthUs))

    l.join(r, Seq(key, cB))
      .where(unix_micros(col(rightTs)) >= unix_micros(col(leftTs)) + lit(lowerUs) &&
        unix_micros(col(rightTs)) < unix_micros(col(leftTs)) + lit(upperUs))
      .drop(cB)
  }

  /** Interval-overlap join: pairs (l, r) of the same key whose half-open
    * intervals `[lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅`. Both sides replicate
    * to every `bucketUs`-wide time bucket their interval covers; a pair
    * meets in every shared bucket, so the emit-once guard keeps only the
    * bucket containing `max(lStart, rStart)` — each overlapping pair
    * appears exactly once WITHOUT a distinct (no extra shuffle). Choose
    * `bucketUs` ≈ the typical interval length: replication stays ~2× and
    * the equi-join on (key, bucket) scales like any hash join.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val taken = (left.columns ++ right.columns).toSet
    val cB = Iterator.from(0).map(i => s"_bucket${if (i == 0) "" else s"_$i"}")
      .find(!taken.contains(_)).get

    def replicated(df: DataFrame, s: String, e: String) = df.withColumn(cB,
      explode(sequence(
        floor_div(unix_micros(col(s)), bucketUs),
        floor_div(unix_micros(col(e)) - 1, bucketUs))))

    replicated(left, lStart, lEnd)
      .join(replicated(right, rStart, rEnd), Seq(key, cB))
      .where(
        unix_micros(col(lStart)) < unix_micros(col(rEnd)) &&
        unix_micros(col(rStart)) < unix_micros(col(lEnd)) &&
        col(cB) === floor_div(greatest(unix_micros(col(lStart)), unix_micros(col(rStart))), bucketUs))
      .drop(cB)
  }

  /** Integer floor division as a Column. `div` truncates toward zero
    * (wrong for negative values); subtracting the positive modulus first
    * makes the quotient exact — (c − pmod(c,d)) is a multiple of d, so the
    * double division is exact for |c| < 2⁵³ µs (year 2255).
    */
  private def floor_div(c: org.apache.spark.sql.Column, d: Long) =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")
}
