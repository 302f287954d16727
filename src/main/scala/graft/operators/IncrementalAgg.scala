package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — refresh a materialized aggregate
  * from a changelog WITHOUT re-reading the base table. The production
  * invariant behind every "daily metrics" table at 100 TB: the base scan
  * happened once, historically; each refresh touches only the delta and
  * the (small) aggregate state.
  *
  * Works for the self-decomposable aggregates (sum/count — and min/max on
  * insert-only deltas): the delta is pre-aggregated per key (map-side
  * partial + one small shuffle on the key), then merged with the current
  * state by a full-outer join — new keys appear, existing keys combine,
  * untouched keys carry through. Deletions arrive as negative
  * contributions (`weight` −1 rows), the standard changelog encoding, so
  * retractions are just more addition. Groups whose count reaches 0
  * disappear (the empty-group rule).
  *
  * The refresh cost is O(|delta| + |state|), independent of the base
  * table — the whole point. Composes with [[Upsert]]/dynamic partition
  * overwrite for idempotent persistence of the refreshed state.
  */
object IncrementalAgg {

  /** One maintained aggregate: `col` must hold (state side and delta side)
    * the same named columns `cnt` and each sum alias.
    */
  final case class SumSpec(alias: String, delta: Column)

  /** Merge a pre-existing aggregate state with a raw changelog.
    *
    * @param state   (keys…, cnt BIGINT, sums…) — the materialized aggregate
    * @param delta   raw changelog rows; `weight` +1 insert / −1 delete
    * @param keys    grouping key columns
    * @param weight  the changelog sign column expression (lit(1L) for
    *                insert-only feeds)
    * @param sums    value sums to maintain, each `delta` expression
    *                evaluated against the changelog rows
    * @return refreshed state, one row per surviving key
    */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
              weight: Column, sums: Seq[SumSpec]): DataFrame = {
    val kc = keys.map(col)
    val deltaAgg = delta.groupBy(kc: _*).agg(
      sum(weight).as("cnt"),
      sums.map(s => sum(s.delta * weight).as(s.alias)): _*)
    val merged = state.select(kc ++ (col("cnt") +: sums.map(s => col(s.alias))): _*)
      .join(deltaAgg.withColumnsRenamed(
        ("cnt" +: sums.map(_.alias)).map(a => a -> s"_d_$a").toMap), keys, "full_outer")
    // NULL discipline: a NULL sum can mean "this side's key is absent"
    // (its cnt is NULL after the full outer) or "present but every measure
    // value was NULL" (SQL sum ignores NULLs; all-NULL groups sum to
    // NULL). Only the first may coalesce to 0 — an absent-side NULL is a
    // missing contribution; a present-side NULL must survive the refresh
    // so refresh(full(base), delta) == full(base ∪ delta) holds on
    // all-NULL groups. cnt itself is never genuinely NULL (weight is
    // non-null by contract), so plain coalesce is right there.
    val bothPresent = col("cnt").isNotNull && col("_d_cnt").isNotNull
    val combined = merged.select(
      kc ++ (
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_d_cnt"), lit(0L))).as("cnt") +:
        sums.map { s =>
          val a = col(s.alias); val d = col(s"_d_${s.alias}")
          when(bothPresent,
            when(a.isNull && d.isNull, lit(null))
              .otherwise(coalesce(a, lit(0L)) + coalesce(d, lit(0L))))
            .otherwise(coalesce(a, d)) // one side absent: the present
              .as(s.alias)             // side's value verbatim, NULL incl.
        }): _*)
    combined.where(col("cnt") > 0)
  }

  /** The from-scratch form of the same aggregate — the correctness oracle
    * for [[refresh]]: `refresh(full(base), delta) == full(base ∪ delta)`.
    */
  def full(rows: DataFrame, keys: Seq[String], weight: Column, sums: Seq[SumSpec]): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(
      sum(weight).as("cnt"),
      sums.map(s => sum(s.delta * weight).as(s.alias)): _*)
      .where(col("cnt") > 0)
}
