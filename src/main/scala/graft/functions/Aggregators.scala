package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Keyed input for [[ArgMaxLong]]: pick the `arg` whose `value` is maximal. */
case class ArgValue(arg: Long, value: Long)

/** Running best (arg, value); `arg = -1` marks the empty buffer. */
case class ArgMaxBuf(arg: Long, value: Long)

/** Typed UDAF (`Aggregator`) — the user-defined-aggregation surface
  * (SURVEY.md §2.11: absent from the reference; supplied here as a library
  * primitive). Arg-max with a deterministic tie-break (smallest arg wins)
  * so results are reproducible under any partitioning: both `reduce` and
  * `merge` apply the same total order, which makes the aggregation a
  * commutative monoid — the property that lets Spark partial-aggregate it
  * map-side like any built-in.
  */
class ArgMaxLong extends Aggregator[ArgValue, ArgMaxBuf, ArgMaxBuf] {
  override def zero: ArgMaxBuf = ArgMaxBuf(-1L, Long.MinValue)

  private def better(a: ArgMaxBuf, b: ArgMaxBuf): ArgMaxBuf =
    if (a.arg == -1L) b
    else if (b.arg == -1L) a
    else if (a.value > b.value || (a.value == b.value && a.arg < b.arg)) a
    else b

  override def reduce(buf: ArgMaxBuf, in: ArgValue): ArgMaxBuf =
    better(buf, ArgMaxBuf(in.arg, in.value))
  override def merge(a: ArgMaxBuf, b: ArgMaxBuf): ArgMaxBuf = better(a, b)
  override def finish(r: ArgMaxBuf): ArgMaxBuf = r
  override def bufferEncoder: Encoder[ArgMaxBuf] = Encoders.product[ArgMaxBuf]
  override def outputEncoder: Encoder[ArgMaxBuf] = Encoders.product[ArgMaxBuf]
}
