package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Rewrite comparisons against second/minute-truncated timestamps into
  * comparisons on the raw column, so they reach the parquet scan as
  * `PushedFilters`.
  *
  * Motivation: the reference dialect's `cast(ts as Datetime)` is a
  * second-truncation (/root/reference/src/py/yq_dag.py:66, SURVEY.md §2.3
  * P3), and its queries FILTER on the truncated value. Translated
  * literally (`date_trunc('SECOND', ts) >= L`), the predicate wraps the
  * column in a function call, which no file format can push down — a
  * YQL-submitted query would full-scan where the native q1 plan prunes.
  *
  * Soundness: truncation to unit u is monotone with trunc(x) ≤ x, and for
  * a literal L ALIGNED to u (L % u = 0):
  *   trunc(x) ≥ L ⟺ x ≥ L        trunc(x) < L ⟺ x < L
  *   trunc(x) > L ⟺ x ≥ L + u    trunc(x) ≤ L ⟺ x < L + u
  *   trunc(x) = L ⟺ L ≤ x < L + u
  * (⇒: trunc(x) ≤ x; ⇐: x ≥ L aligned ⇒ trunc(x) ≥ L.) NULLs propagate
  * identically on both sides, and the equivalences are pointwise, so the
  * rewrite is valid anywhere the expression appears, not just in filters.
  * Non-aligned literals are left untouched.
  *
  * Only SECOND and MINUTE are rewritten: every real-world UTC offset is a
  * whole number of minutes, so micros-modulo alignment is zone-independent
  * for these units; HOUR/DAY alignment would depend on the trunc's zone
  * (half-hour offsets, DST) and is deliberately out of scope.
  */
object TruncationComparisonRewrite extends Rule[LogicalPlan] {

  private val Units: Map[String, Long] = Map(
    "SECOND" -> 1000000L,
    "MINUTE" -> 60000000L)

  private def unitOf(fmt: Expression): Option[Long] = fmt match {
    case Literal(s, StringType) if s != null => Units.get(s.toString.toUpperCase)
    case _ => None
  }

  private def alignedUnit(fmt: Expression, v: Long): Option[Long] =
    unitOf(fmt).filter(u => Math.floorMod(v, u) == 0L)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(TruncTimestamp(fmt, ts, _), l @ Literal(v: Long, TimestampType))
        if alignedUnit(fmt, v).isDefined =>
      GreaterThanOrEqual(ts, l)
    case LessThan(TruncTimestamp(fmt, ts, _), l @ Literal(v: Long, TimestampType))
        if alignedUnit(fmt, v).isDefined =>
      LessThan(ts, l)
    case GreaterThan(TruncTimestamp(fmt, ts, _), Literal(v: Long, TimestampType))
        if alignedUnit(fmt, v).isDefined =>
      GreaterThanOrEqual(ts, Literal(v + alignedUnit(fmt, v).get, TimestampType))
    case LessThanOrEqual(TruncTimestamp(fmt, ts, _), Literal(v: Long, TimestampType))
        if alignedUnit(fmt, v).isDefined =>
      LessThan(ts, Literal(v + alignedUnit(fmt, v).get, TimestampType))
    case EqualTo(TruncTimestamp(fmt, ts, _), l @ Literal(v: Long, TimestampType))
        if alignedUnit(fmt, v).isDefined =>
      And(GreaterThanOrEqual(ts, l), LessThan(ts, Literal(v + alignedUnit(fmt, v).get, TimestampType)))
    // mirrored literal-first forms: L ≤ trunc(x) ⟺ x ≥ L; L > trunc(x) ⟺ x < L
    case LessThanOrEqual(l @ Literal(v: Long, TimestampType), TruncTimestamp(fmt, ts, _))
        if alignedUnit(fmt, v).isDefined =>
      LessThanOrEqual(l, ts)
    case GreaterThan(l @ Literal(v: Long, TimestampType), TruncTimestamp(fmt, ts, _))
        if alignedUnit(fmt, v).isDefined =>
      GreaterThan(l, ts)
  }
}
