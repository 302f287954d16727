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
  * NULL discipline: SQL `sum` over a group with no non-NULL values is
  * NULL, and retractions can empty a group's non-NULL contributions while
  * NULL-measure rows keep cnt > 0 — additive sums alone cannot tell that
  * apart from a genuine 0. So the state carries, per sum, a non-NULL
  * contribution count `_nn_<alias>` (insert of a non-NULL value +1,
  * retraction −1); the published sum is NULL exactly when that count is 0.
  * This makes `refresh(full(base), Δ) == full(base ⊎ Δ)` hold on every
  * changelog, including full retraction of a group's non-NULL rows
  * (IncrementalAggSpec pins the edge).
  *
  * The refresh cost is O(|delta| + |state|), independent of the base
  * table — the whole point. Composes with [[Upsert]]/dynamic partition
  * overwrite for idempotent persistence of the refreshed state.
  */
object IncrementalAgg {

  /** One maintained aggregate: `col` must hold (state side and delta side)
    * the same named columns `cnt`, each sum alias, and each `_nn_<alias>`
    * non-NULL contribution count.
    */
  final case class SumSpec(alias: String, delta: Column)

  /** One maintained MIN/MAX pair (state columns `min_<alias>` /
    * `max_<alias>`). Extrema are NOT retractable from (value, count)
    * state — removing the current minimum says nothing about the next —
    * so [[refreshWithExtrema]] needs the base relation: retraction-touched
    * keys are re-aggregated from base ⊎ delta restricted to those keys
    * (O(Δ + affected-key rows), not O(base) — provided the base's access
    * path prunes on the key, e.g. partition/cluster on it; see SCALE.md).
    * Insert-only-touched keys merge with least/greatest and never reread
    * base. `delta` must be an expression resolvable against BOTH the
    * changelog rows and the base rows (same column names).
    */
  final case class ExtremaSpec(alias: String, delta: Column)

  private def nn(alias: String): String = s"_nn_$alias"
  private def minC(alias: String): String = s"min_$alias"
  private def maxC(alias: String): String = s"max_$alias"

  /** Null-safe equi-join on `on` columns: a NULL group key is a legal
    * group (groupBy and Window.partitionBy both treat NULL as a value, so
    * every from-scratch twin aggregates it) — with plain join equality a
    * NULL-key group would never match its state/base counterpart and the
    * refresh would silently diverge from the oracle. `<=>` matches
    * groupBy's semantics. For row-producing join types the right side's
    * key columns are coalesced away so the result keeps one set of key
    * columns (the usingColumns shape the callers expect); non-key columns
    * must be name-disjoint across sides.
    */
  private def nsKeyJoin(x: DataFrame, y: DataFrame, on: Seq[String],
                        joinType: String): DataFrame = {
    val yr = on.foldLeft(y)((d, c) => d.withColumnRenamed(c, s"_k_$c"))
    val cond = on.map(c => col(c) <=> col(s"_k_$c")).reduce(_ && _)
    val j = x.join(yr, cond, joinType)
    joinType match {
      case "left_semi" | "left_anti" => j
      case _ =>
        val rest = (x.columns.filterNot(on.contains) ++
          y.columns.filterNot(on.contains)).toSeq
        j.select(on.map(c => coalesce(col(c), col(s"_k_$c")).as(c)) ++
          rest.map(col): _*)
    }
  }

  /** Mask a raw additive sum by its non-NULL contribution count: 0
    * contributions ⇒ NULL (the from-scratch answer), else the raw sum
    * (which a masked-NULL state stores as NULL but whose additive value is
    * then exactly 0, so `coalesce(sum, 0)` reconstructs it).
    */
  private def masked(raw: Column, nnCol: Column, alias: String): Column =
    when(nnCol > 0, raw).otherwise(lit(null)).as(alias)

  /** Merge a pre-existing aggregate state with a raw changelog.
    *
    * @param state   (keys…, cnt BIGINT, sums…, `_nn_` counts…) — the
    *                materialized aggregate, as produced by [[full]] or a
    *                previous refresh
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
      sums.flatMap(s => Seq(
        sum(s.delta * weight).as(s.alias),
        sum(when(s.delta.isNotNull, weight).otherwise(0L)).as(nn(s.alias)))): _*)
    val stateCols = "cnt" +: sums.flatMap(s => Seq(s.alias, nn(s.alias)))
    val merged = nsKeyJoin(state.select((kc ++ stateCols.map(col)): _*),
      deltaAgg.withColumnsRenamed(stateCols.map(a => a -> s"_d_$a").toMap),
      keys, "full_outer")
    // After the full outer, a NULL on either side means "key absent there"
    // (contributes 0) or, for a sum column, "present but masked/all-NULL"
    // (raw additive value also 0) — either way coalesce-to-0 is exact, and
    // the merged _nn_ count alone decides whether the published sum is NULL.
    val combined = merged.select(
      kc ++ (
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_d_cnt"), lit(0L))).as("cnt") +:
        sums.flatMap { s =>
          val mergedNn = coalesce(col(nn(s.alias)), lit(0L)) +
            coalesce(col(s"_d_${nn(s.alias)}"), lit(0L))
          val mergedRaw = coalesce(col(s.alias), lit(0L)) +
            coalesce(col(s"_d_${s.alias}"), lit(0L))
          Seq(masked(mergedRaw, mergedNn, s.alias), mergedNn.as(nn(s.alias)))
        }): _*)
    combined.where(col("cnt") > 0)
  }

  /** Per-key MIN/MAX over the SURVIVING multiset of a weighted changelog:
    * rows collapse on (keys, value-tuple) with Σweight as multiplicity,
    * tuples with multiplicity ≤ 0 drop, extrema aggregate what remains.
    * Exact for any changelog (retractions cancel matching tuples); NULL
    * values ride along and are ignored by min/max, so an all-NULL group
    * publishes NULL extrema like a from-scratch aggregate.
    */
  private def survivingExtrema(rows: DataFrame, keys: Seq[String], weight: Column,
                               extrema: Seq[ExtremaSpec], prefix: String): DataFrame = {
    val kc = keys.map(col)
    val vNames = extrema.map(e => s"_v_${e.alias}")
    val surv = rows
      .select(kc ++ extrema.zip(vNames).map { case (e, v) => e.delta.as(v) } :+
        weight.cast("long").as("_w"): _*)
      .groupBy(kc ++ vNames.map(col): _*)
      .agg(sum(col("_w")).as("_m"))
      .where(col("_m") > 0)
    val aggs = extrema.zip(vNames).flatMap { case (e, v) =>
      Seq(min(col(v)).as(prefix + minC(e.alias)), max(col(v)).as(prefix + maxC(e.alias)))
    }
    surv.groupBy(kc: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[refresh]] plus MIN/MAX maintenance. Sums/counts refresh exactly as
    * [[refresh]]; extrema take one of two paths per key:
    *
    *  - keys touched ONLY by inserts: `least`/`greatest` of the state's
    *    extrema and the delta-insert extrema — no base access;
    *  - keys touched by any retraction: exact re-aggregation over
    *    base ⊎ delta RESTRICTED to those keys (semi-join), the O(Δ ·
    *    affected) repair — never a full-base rescan in the plan shape,
    *    and never a wrong "previous max lingers" answer.
    *
    * `refreshWithExtrema(fullWithExtrema(base), Δ, base) ==
    * fullWithExtrema(base ⊎ Δ)` on every changelog (IncrementalAggSpec
    * pins retract-the-min, full-retraction→NULL, and the stepwise
    * property).
    */
  def refreshWithExtrema(state: DataFrame, delta: DataFrame, base: DataFrame,
                         keys: Seq[String], weight: Column, sums: Seq[SumSpec],
                         extrema: Seq[ExtremaSpec]): DataFrame = {
    val refreshed = refresh(state, delta, keys, weight, sums)
    if (extrema.isEmpty) return refreshed
    val kc = keys.map(col)
    // insert-merge side: per-key extrema of the positive-weight delta rows
    val dInsAggs = extrema.flatMap(e => Seq(
      min(e.delta).as(s"_di_${minC(e.alias)}"),
      max(e.delta).as(s"_di_${maxC(e.alias)}")))
    val dIns = delta.where(weight > 0).groupBy(kc: _*).agg(dInsAggs.head, dInsAggs.tail: _*)
    val extState = state.select(kc ++ extrema.flatMap(e =>
      Seq(col(minC(e.alias)), col(maxC(e.alias)))): _*)
    // least/greatest skip NULLs, so a key present on one side only keeps
    // the other side's extremum — exactly the merge semantics we need
    val merged = nsKeyJoin(extState, dIns, keys, "full_outer")
      .select(kc ++ extrema.flatMap(e => Seq(
        least(col(minC(e.alias)), col(s"_di_${minC(e.alias)}")).as(s"_mg_${minC(e.alias)}"),
        greatest(col(maxC(e.alias)), col(s"_di_${maxC(e.alias)}")).as(s"_mg_${maxC(e.alias)}"))): _*)
    // repair side: exact surviving-multiset extrema for retraction-touched keys
    val touched = delta.where(weight < 0).select(kc: _*).distinct()
    val contrib = base
      .select(kc ++ extrema.map(e => e.delta.as(s"_v_${e.alias}")) :+ lit(1L).as("_cw"): _*)
      .unionByName(delta.select(kc ++ extrema.map(e => e.delta.as(s"_v_${e.alias}")) :+
        weight.cast("long").as("_cw"): _*))
    val contribTouched = nsKeyJoin(contrib, touched, keys, "left_semi")
    val repaired = survivingExtrema(contribTouched, keys, col("_cw"),
      extrema.map(e => ExtremaSpec(e.alias, col(s"_v_${e.alias}"))), "_rc_")
    nsKeyJoin(nsKeyJoin(nsKeyJoin(refreshed, merged, keys, "left"),
        repaired, keys, "left"),
        touched.withColumn("_retr", lit(true)), keys, "left")
      .select(kc ++ ("cnt" +: sums.flatMap(s => Seq(s.alias, nn(s.alias)))).map(col) ++
        extrema.flatMap(e => Seq(
          when(col("_retr"), col(s"_rc_${minC(e.alias)}"))
            .otherwise(col(s"_mg_${minC(e.alias)}")).as(minC(e.alias)),
          when(col("_retr"), col(s"_rc_${maxC(e.alias)}"))
            .otherwise(col(s"_mg_${maxC(e.alias)}")).as(maxC(e.alias)))): _*)
  }

  /** [[full]] plus per-key MIN/MAX over the surviving multiset — the
    * from-scratch twin of [[refreshWithExtrema]].
    */
  def fullWithExtrema(rows: DataFrame, keys: Seq[String], weight: Column,
                      sums: Seq[SumSpec], extrema: Seq[ExtremaSpec]): DataFrame = {
    val s = full(rows, keys, weight, sums)
    if (extrema.isEmpty) s
    else nsKeyJoin(s, survivingExtrema(rows, keys, weight, extrema, ""), keys, "left")
  }

  /** Per-key TOP-K over the surviving multiset: rows collapse on
    * (keys, id, value) with Σweight as multiplicity, tuples with
    * multiplicity ≤ 0 drop, and the survivors rank by (value DESC,
    * id ASC) — the deterministic tie order — keeping ranks 1..k.
    * Output: (keys…, rank INT, id, value). `id` must be unique within a
    * key (an order id, a doc id), which makes retraction "cancel that
    * tuple" rather than "decrement an anonymous copy".
    */
  def fullTopK(rows: DataFrame, keys: Seq[String], weight: Column,
               id: Column, value: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val surv = rows
      .select(kc ++ Seq(id.as("_id"), value.as("_val"), weight.cast("long").as("_w")): _*)
      .groupBy(kc ++ Seq(col("_id"), col("_val")): _*)
      .agg(sum(col("_w")).as("_m"))
      .where(col("_m") > 0)
    surv
      .withColumn("rank", row_number().over(
        Window.partitionBy(kc: _*).orderBy(col("_val").desc, col("_id"))))
      .where(col("rank") <= k)
      .select(kc ++ Seq(col("rank"), col("_id").as("id"), col("_val").as("value")): _*)
  }

  /** Incremental TOP-K maintenance — the [[refreshWithExtrema]] shape
    * generalized from 1 extremum to k. Top-k is not retractable from
    * k rows of state (evicting rank 3 says nothing about the old rank
    * k+1), so keys touched by any retraction re-rank exactly over
    * base ⊎ delta RESTRICTED to those keys (one semi-join — O(Δ ·
    * affected-key rows) given a key-pruning base layout, never a full
    * rescan in the plan). Keys touched only by inserts re-rank the
    * union of the k state rows and their delta inserts — no base
    * access, correct because inserts can only push survivors down:
    * the new top-k ⊆ old top-k ∪ inserts.
    *
    * `refreshTopK(fullTopK(base), Δ, base) == fullTopK(base ⊎ Δ)` on
    * every changelog (IncrementalAggSpec pins retract-the-leader and
    * the stepwise property).
    */
  def refreshTopK(state: DataFrame, delta: DataFrame, base: DataFrame,
                  keys: Seq[String], weight: Column,
                  id: Column, value: Column, k: Int): DataFrame = {
    val kc = keys.map(col)
    val touched = delta.where(weight < 0).select(kc: _*).distinct()
    val inserts = delta.where(weight > 0)
      .select(kc ++ Seq(id.as("id"), value.as("value")): _*)
    // insert-merge side: old top-k rows ∪ delta inserts, re-ranked
    val mergedIn = nsKeyJoin(
      state.select(kc ++ Seq(col("id"), col("value")): _*).unionByName(inserts),
      touched, keys, "left_anti")
    val merged = fullTopK(mergedIn, keys, lit(1L), col("id"), col("value"), k)
    // repair side: exact surviving-multiset re-rank for retraction keys
    val contrib = nsKeyJoin(
      base.select(kc ++ Seq(id.as("id"), value.as("value"), lit(1L).as("_cw")): _*)
        .unionByName(delta.select(kc ++ Seq(id.as("id"), value.as("value"),
          weight.cast("long").as("_cw")): _*)),
      touched, keys, "left_semi")
    val repaired = fullTopK(contrib, keys, col("_cw"), col("id"), col("value"), k)
    merged.unionByName(repaired)
  }

  /** Presence index for exact per-key DISTINCT-count maintenance: one row
    * per surviving (keys, value) tuple with its multiplicity Σweight.
    * COUNT(DISTINCT v) is not retractable from a bare count — removing one
    * of two copies of a value must NOT decrement it — but it IS exactly
    * maintainable from this index: a refresh touches only Δ's tuples, and
    * the distinct count moves by the number of tuples whose multiplicity
    * crosses zero. NULL values are excluded up front (SQL COUNT(DISTINCT)
    * ignores them — and NULL join keys would break the index merge).
    */
  def fullDistinctIndex(rows: DataFrame, keys: Seq[String], weight: Column,
                        value: Column): DataFrame = {
    val kc = keys.map(col)
    rows.select(kc :+ value.as("_dv") :+ weight.cast("long").as("_w"): _*)
      .where(col("_dv").isNotNull)
      .groupBy(kc :+ col("_dv"): _*).agg(sum(col("_w")).as("m"))
      .where(col("m") > 0)
  }

  /** The published per-key distinct count over a presence index. */
  def distinctSummary(index: DataFrame, keys: Seq[String]): DataFrame =
    index.groupBy(keys.map(col): _*).agg(count(lit(1)).as("ndv"))

  /** Incremental DISTINCT-count refresh: merge the changelog into the
    * presence index (one (keys, value) shuffle over Δ + the index join —
    * O(Δ + index), never O(base); at scale the index is bucketed on the
    * join key so the merge is exchange-free), and adjust each key's
    * count by the zero-crossings — appeared tuples +1, vanished −1 —
    * rather than recounting the index. Returns (new index, new summary);
    * both must persist for the next refresh.
    *
    * `refreshDistinct(fullDistinctIndex(base), …, Δ) ≡
    * distinct-count(base ⊎ Δ)` on every changelog — including retracting
    * one of two copies of a value (count unchanged) and over-retraction
    * (tuple vanishes) — pinned by `IncrementalAggSpec`.
    */
  def refreshDistinct(index: DataFrame, summary: DataFrame, delta: DataFrame,
                      keys: Seq[String], weight: Column,
                      value: Column): (DataFrame, DataFrame) = {
    val kc = keys.map(col)
    val dIdx = delta.select(kc :+ value.as("_dv") :+ weight.cast("long").as("_w"): _*)
      .where(col("_dv").isNotNull)
      .groupBy(kc :+ col("_dv"): _*).agg(sum(col("_w")).as("_dm"))
    val joined = nsKeyJoin(index, dIdx, keys :+ "_dv", "full_outer")
    val mNew = coalesce(col("m"), lit(0L)) + coalesce(col("_dm"), lit(0L))
    val newIndex = joined.select(kc ++ Seq(col("_dv"), mNew.as("m")): _*)
      .where(col("m") > 0)
    val chg = when(col("m").isNull && mNew > 0, 1L)
      .when(col("m").isNotNull && mNew <= 0, -1L)
      .otherwise(0L)
    val ndvDelta = joined.groupBy(kc: _*).agg(sum(chg).as("_dndv"))
      .where(col("_dndv") =!= 0)
    val newSummary = nsKeyJoin(summary, ndvDelta, keys, "full_outer")
      .select(kc :+ (coalesce(col("ndv"), lit(0L)) + coalesce(col("_dndv"), lit(0L))).as("ndv"): _*)
      .where(col("ndv") > 0)
    (newIndex, newSummary)
  }

  /** The from-scratch form of the same aggregate — the correctness oracle
    * for [[refresh]]: `refresh(full(base), delta) == full(base ∪ delta)`
    * on any changelog (the `_nn_` masking applies here too, so a group
    * whose non-NULL rows fully cancel publishes NULL, exactly like an
    * aggregate over the surviving multiset).
    */
  def full(rows: DataFrame, keys: Seq[String], weight: Column, sums: Seq[SumSpec]): DataFrame = {
    val agg = rows.groupBy(keys.map(col): _*).agg(
      sum(weight).as("cnt"),
      sums.flatMap(s => Seq(
        sum(s.delta * weight).as(s"_raw_${s.alias}"),
        sum(when(s.delta.isNotNull, weight).otherwise(0L)).as(nn(s.alias)))): _*)
    agg.select(
      keys.map(col) ++ (
        col("cnt") +:
        sums.flatMap(s => Seq(
          masked(coalesce(col(s"_raw_${s.alias}"), lit(0L)), col(nn(s.alias)), s.alias),
          col(nn(s.alias))))): _*)
      .where(col("cnt") > 0)
  }
}
