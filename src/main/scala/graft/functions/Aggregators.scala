package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Keyed input for [[ArgMaxLong]]: pick the `arg` whose `value` is maximal. */
case class ArgValue(arg: Long, value: Long)

/** Running best (arg, value). `set = false` marks the empty buffer — an
  * explicit flag rather than a sentinel arg value, so EVERY Long is a
  * legitimate arg (a reserved `-1` would silently shadow real `-1` keys).
  */
case class ArgMaxBuf(arg: Long, value: Long, set: Boolean)

/** Typed UDAF (`Aggregator`) — the user-defined-aggregation surface
  * (SURVEY.md §2.11: absent from the reference; supplied here as a library
  * primitive). Arg-max with a deterministic tie-break (smallest arg wins)
  * so results are reproducible under any partitioning: both `reduce` and
  * `merge` apply the same total order, which makes the aggregation a
  * commutative monoid — the property that lets Spark partial-aggregate it
  * map-side like any built-in. The output carries the `set` flag so an
  * all-merged-empty group is distinguishable from a real (arg, value) row.
  */
class ArgMaxLong extends Aggregator[ArgValue, ArgMaxBuf, ArgMaxBuf] {
  override def zero: ArgMaxBuf = ArgMaxBuf(0L, Long.MinValue, set = false)

  private def better(a: ArgMaxBuf, b: ArgMaxBuf): ArgMaxBuf =
    if (!a.set) b
    else if (!b.set) a
    else if (a.value > b.value || (a.value == b.value && a.arg < b.arg)) a
    else b

  override def reduce(buf: ArgMaxBuf, in: ArgValue): ArgMaxBuf =
    better(buf, ArgMaxBuf(in.arg, in.value, set = true))
  override def merge(a: ArgMaxBuf, b: ArgMaxBuf): ArgMaxBuf = better(a, b)
  override def finish(r: ArgMaxBuf): ArgMaxBuf = r
  override def bufferEncoder: Encoder[ArgMaxBuf] = Encoders.product[ArgMaxBuf]
  override def outputEncoder: Encoder[ArgMaxBuf] = Encoders.product[ArgMaxBuf]
}
