package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission gate a training
  * pipeline runs before data enters the corpus (the reference's analog is
  * the reconcile-before-drop discipline, /root/reference/src/py/yq_dag.py:82-95:
  * verify, then act). Three verbs over one rule set:
  *
  *  - [[audit]]: per-rule violation counts — one scan, map-side flags,
  *    a single tiny aggregate; the cheap always-on monitor.
  *  - [[split]]: (clean, quarantined) — quarantined rows carry the array
  *    of failed rule names, so triage keeps full provenance. Both sides
  *    of the split are lazy projections of ONE scan (Spark caches the
  *    common subplan; no second read at 100 TB when written back-to-back).
  *  - [[enforce]]: fail fast when any rule is violated (the C3 fail-task
  *    shape) — for pipelines where quarantine is not an option.
  *
  * Rules are plain `Column` predicates, so they compile into the scan's
  * whole-stage codegen like any filter; a NULL predicate result counts as
  * a violation (three-valued logic must not let unknowns through).
  */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  private def violated(r: Rule): Column = !coalesce(r.predicate, lit(false))

  /** Per-rule violation counts plus the total row count, as one narrow
    * aggregate row set: (rule, n_violations, n_rows).
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val flags = rules.map(r => sum(when(violated(r), 1L).otherwise(0L)).as(r.name))
    val agg = df.agg(count(lit(1)).as("_n"), flags: _*)
    // one input row → |rules| output rows: stack the counts
    val stacked = explode(array(rules.map(r =>
      struct(lit(r.name).as("rule"), col(r.name).as("n_violations"))): _*))
    agg.select(col("_n"), stacked.as("s"))
      .select(col("s.rule").as("rule"), col("s.n_violations").as("n_violations"),
        col("_n").as("n_rows"))
  }

  /** Tag every row with its failed rules: adds `_violations ARRAY<STRING>`
    * (empty = clean).
    */
  def tag(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("_violations",
      filter(array(rules.map(r => when(violated(r), r.name)): _*), _.isNotNull))

  /** (clean rows unchanged, quarantined rows + `_violations`). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = tag(df, rules)
    (tagged.where(size(col("_violations")) === 0).drop("_violations"),
      tagged.where(size(col("_violations")) > 0))
  }

  /** Throws with the per-rule counts when any rule is violated. */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = audit(df, rules).where(col("n_violations") > 0)
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"data-quality expectations violated: ${bad.mkString(", ")}")
  }
}
