package graft.plans

import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, TimestampType}

/** Optimizer rule (SURVEY.md §4, §7.3): derive a `payment_year` partition
  * predicate from a half-open `payment_date` range filter.
  *
  * The reference's reconciliation query filters the Object-Storage side on
  * `payment_date` only (/root/reference/src/py/yq_dag.py:90-91), so YQ —
  * and stock Spark — scan every `payment_year=*` partition of the cold
  * store. Since the store writes `payment_year = year(payment_date)`
  * (yq_dag.py:73), a date window `[lo, hi)` implies
  * `payment_year BETWEEN year(lo) AND year(hi - 1µs)`; adding that
  * predicate lets Spark's partition pruning skip whole directories — the
  * difference between touching 1 year and touching 100 TB.
  *
  * Contract: applies only to plans that expose BOTH `payment_date:
  * timestamp` and `payment_year: int` — the cold-store schema
  * (sources.ColdStore), where the invariant holds by construction.
  */
object PartitionYearPruningRule extends Rule[LogicalPlan] with PredicateHelper {

  private def yearOfMicros(us: Long): Int =
    Instant.EPOCH.plusNanos(us * 1000L).atZone(ZoneOffset.UTC).getYear

  /** Harvest `payment_date` bounds ONLY from top-level conjuncts. A bound
    * nested under OR/NOT does not constrain the whole filter (e.g.
    * `(pd >= a AND pd < b) OR amount > 5` admits rows of any year), so a
    * year range derived from it would silently drop rows. Restricting to
    * direct top-level comparisons makes the derived range a logical
    * consequence of the filter: `cond ⇒ conjunct ⇒ year-range`.
    */
  private def boundsOf(cond: Expression, dateAttr: Attribute): (Option[Long], Option[Long]) = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a: Attribute, Literal(v: Long, TimestampType)) if a.semanticEquals(dateAttr) =>
        lo = Some(lo.fold(v)(math.max(_, v)))
      case GreaterThan(a: Attribute, Literal(v: Long, TimestampType)) if a.semanticEquals(dateAttr) =>
        lo = Some(lo.fold(v)(math.max(_, v))) // strict > implies >= for year derivation
      case LessThan(a: Attribute, Literal(v: Long, TimestampType)) if a.semanticEquals(dateAttr) =>
        hi = Some(hi.fold(v)(math.min(_, v)))
      case LessThanOrEqual(a: Attribute, Literal(v: Long, TimestampType)) if a.semanticEquals(dateAttr) =>
        hi = Some(hi.fold(v + 1)(math.min(_, v + 1))) // inclusive -> half-open
      case _ => () // conjuncts with OR/NOT or non-literal bounds contribute nothing
    }
    (lo, hi)
  }

  /** Gate: fire only when the filter sits over a file scan that is
    * physically Hive-partitioned by `payment_year` — the ColdStore layout,
    * where `payment_year = year(payment_date)` holds by construction
    * (ColdStore.exportYear). Matching by column names alone would rewrite
    * arbitrary user tables that merely happen to share the names.
    */
  private def overPartitionedScan(plan: LogicalPlan): Boolean = plan match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        fs.partitionSchema.exists(f => f.name == "payment_year" && f.dataType == IntegerType)
      case _ => false
    }
    case p: Project       => overPartitionedScan(p.child)
    case s: SubqueryAlias => overPartitionedScan(s.child)
    case _                => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child)
        if overPartitionedScan(child) &&
          child.output.exists(a => a.name == "payment_year" && a.dataType == IntegerType) &&
          child.output.exists(a => a.name == "payment_date" && a.dataType == TimestampType) &&
          !cond.references.exists(_.name == "payment_year") =>
      val dateAttr = child.output.find(_.name == "payment_date").get
      val yearAttr = child.output.find(_.name == "payment_year").get
      boundsOf(cond, dateAttr) match {
        case (Some(lo), Some(hi)) if hi > lo =>
          val yLo = yearOfMicros(lo)
          val yHi = yearOfMicros(hi - 1) // half-open upper bound
          val pruned = And(
            GreaterThanOrEqual(yearAttr, Literal(yLo, IntegerType)),
            LessThanOrEqual(yearAttr, Literal(yHi, IntegerType)))
          Filter(And(cond, pruned), child)
        case _ => f
      }
  }
}

/** `spark.sql.extensions`-style installer, also callable from
  * `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TruncationComparisonRewrite)
    ext.injectOptimizerRule(_ => PartitionYearPruningRule)
  }
}
