package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built from
  * the higher-order functions (`zip_with`, `aggregate`, `transform`) so they
  * stay inside Catalyst (no UDF, no driver collect).
  *
  * Floats are widened to double *before* any arithmetic and every reduction
  * is a sequential left fold — the exact IEEE operation order the DuckDB
  * oracle reproduces with `list_reduce`, making cosine values bit-identical
  * across engines.
  */
object Vectors {

  private def toD(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold sum of a double array. */
  def foldSum(v: Column): Column = aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) as an in-order fold over element products. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(toD(a), toD(b), (x, y) => x * y))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = {
    val d = toD(a)
    foldSum(zip_with(d, d, (x, y) => x * y))
  }

  /** cosine(a, b) = dot / sqrt(|a|² * |b|²) — single sqrt so the oracle's
    * rounding path is identical.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))
}
