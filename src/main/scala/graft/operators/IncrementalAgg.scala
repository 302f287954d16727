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
    val combined = merged.select(
      kc ++ (
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_d_cnt"), lit(0L))).as("cnt") +:
        sums.map(s =>
          (coalesce(col(s.alias), lit(0L)) + coalesce(col(s"_d_${s.alias}"), lit(0L)))
            .as(s.alias))): _*)
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
