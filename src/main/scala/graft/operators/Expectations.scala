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
  *    of failed rule names, so triage keeps full provenance. The tagged
  *    frame is persisted inside split (Spark does NOT reuse unpersisted
  *    subplans across two actions), so writing clean then quarantined
  *    back-to-back scans the source once; the caller releases it via the
  *    returned handle when both sides are materialized.
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
    // coalesce: sum over ZERO rows is NULL — an empty input must report
    // 0 violations per rule, not NULL (the monitor reads "no data, no
    // violations", and downstream `> 0` filters stay two-valued)
    val flags = rules.map(r =>
      coalesce(sum(when(violated(r), 1L).otherwise(0L)), lit(0L)).as(r.name))
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

  /** Both sides of a [[split]] plus the persist handle for the shared
    * tagged frame: call [[Split.release]] after materializing both sides
    * (a no-op when the split was built with `StorageLevel.NONE`).
    */
  final case class Split(clean: DataFrame, quarantined: DataFrame,
      private val tagged: DataFrame) {
    def release(): Unit = { tagged.unpersist(); () }
  }

  /** (clean rows unchanged, quarantined rows + `_violations`) off ONE
    * scan of `df` — see the class doc for the release contract.
    *
    * `storage` sizes the shared-scan cache. MEMORY_AND_DISK (default) is
    * right when the source scan is expensive relative to a spill of the
    * full tagged frame; at the 100 TB design point that persist is itself
    * a second copy of the corpus on executor local disk, which can cost
    * MORE than the rescan it avoids — pass `StorageLevel.NONE` there to
    * skip caching entirely and let each side re-run the (columnar,
    * pushdown-pruned) scan, or `MEMORY_AND_DISK_SER` to trade CPU for
    * footprint. See SCALE.md "Expectations.split persist vs rescan".
    */
  def split(df: DataFrame, rules: Seq[Rule],
      storage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): Split = {
    val tagged0 = tag(df, rules)
    val tagged =
      if (storage == org.apache.spark.storage.StorageLevel.NONE) tagged0
      else tagged0.persist(storage)
    Split(
      tagged.where(size(col("_violations")) === 0).drop("_violations"),
      tagged.where(size(col("_violations")) > 0),
      tagged)
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
