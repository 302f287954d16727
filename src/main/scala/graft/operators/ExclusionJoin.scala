package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** YQL `EXCLUSION JOIN` (SURVEY.md §2.4 J1): the symmetric difference of two
  * relations on a conjunctive equi-key — rows of *either* side with no match
  * on the other (= FULL OUTER minus INNER). The reference uses it as the
  * copy-reconciliation test whose cardinality must be 0 before the
  * destructive partition drop (/root/reference/src/py/yq_dag.py:93-94).
  *
  * Spark has no single join type for this; we compose it two ways:
  *
  *  - [[apply]]: `(L anti R) UNION ALL (R anti L)` — preserves each side's
  *    full rows. Both anti joins shuffle on the same key, so at scale the two
  *    passes hash-partition identically (sort-merge anti, no broadcast — both
  *    sides are large in the reconciliation use).
  *  - [[count]]: single FULL OUTER self-reconciliation on the key projection
  *    with presence markers — ONE join (one shuffle per side instead of two)
  *    for the count-only gate, the hot path of the pipeline.
  *
  * NULL keys never match (standard equi-join semantics), mirroring YQL; the
  * reference deliberately keys on NOT NULL columns only. The key includes a
  * DOUBLE (`amount`) — equality is bit-exact, so the pipeline must not
  * introduce any float rounding between export and check.
  */
object ExclusionJoin {

  /** Full-row symmetric difference; output schema = union of both schemas by
    * name (missing columns null-filled), plus nothing else.
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")
      .unionByName(right.join(left, keys, "left_anti"), allowMissingColumns = true)

  /** Symmetric difference tagged with the originating side (like the
    * reference's `'pg' as src` / `'s3' as src` convention).
    */
  def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
             tagCol: String = "side", leftTag: String = "l", rightTag: String = "r"): DataFrame =
    left.join(right, keys, "left_anti").withColumn(tagCol, lit(leftTag))
      .unionByName(right.join(left, keys, "left_anti").withColumn(tagCol, lit(rightTag)),
        allowMissingColumns = true)

  /** Count-only reconciliation (`select count(1) from L exclusion join R`):
    * one aggregated full-outer join over de-duplicated key projections.
    *
    * Note: the reference's semantics are bag semantics over key tuples; the
    * pipeline's keys are unique per row (id is a PK member), so we reconcile
    * multiplicities too via per-side pre-aggregated counts — catches
    * duplicate-row corruption, not just missing rows.
    */
  def count(left: DataFrame, right: DataFrame, keys: Seq[String]): Long = {
    val kc = keys.map(col)
    val l = left.groupBy(kc: _*).agg(sum(lit(1L)).as("_ln"))
    val r = right.groupBy(kc: _*).agg(sum(lit(1L)).as("_rn"))
    val joined = l.join(r, keys, "full_outer")
    // A key tuple contributes |ln - rn| mismatched rows (missing side counts 0).
    val mism = joined.select(
      abs(coalesce(col("_ln"), lit(0L)) - coalesce(col("_rn"), lit(0L))).as("_d"))
    mism.agg(coalesce(sum(col("_d")), lit(0L))).head.getLong(0)
  }
}
