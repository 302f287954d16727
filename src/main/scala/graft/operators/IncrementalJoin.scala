package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN-view maintenance — refresh a materialized inner-join
  * view from changelogs of EITHER side without re-joining the bases: the
  * classical IVM delta identity
  *
  *   ΔV = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * over bag semantics: each side persists as a multiplicity index (one row
  * per distinct (keys, payload) tuple with m = Σw), a joined row's
  * multiplicity is the PRODUCT of its sides', and retraction is a −1
  * weight whose products cancel matching view rows — deleting a customer
  * cascades its whole order fan-out out of the view with one Δ row.
  * All three delta terms join a Δ against an index (or Δ⋈Δ), so a refresh
  * costs O(Δ·fan-out + state-merge), never O(A⋈B); at scale the indexes
  * and the view bucket on the join key, making every merge exchange-free
  * (the BucketedStores layout).
  *
  * Input convention: raw rows carry a `w` BIGINT changelog weight column
  * (+1 insert / −1 delete); every other column is keys + payload, with
  * payload names disjoint across sides.
  *
  * `refresh(full(a, b), ΔA, ΔB) == full(a ⊎ ΔA, b ⊎ ΔB)` on every
  * changelog — including multi-copy tuples and cancellation to zero —
  * pinned by `IncrementalJoinSpec` and gated by `u7_incremental_join`.
  *
  * Contract (shared with every IVM system and with `IncrementalAgg`): a
  * changelog never retracts a tuple below zero NET mass — indexes clamp
  * at zero, so negative residue from an over-retraction is not carried
  * to later refreshes.
  */
object IncrementalJoin {

  /** The maintained state: per-side multiplicity indexes + the view.
    * Index schema: (keys…, payload…, m). View schema: (keys…, a-payload…,
    * b-payload…, m).
    */
  final case class JoinState(aIdx: DataFrame, bIdx: DataFrame, view: DataFrame)

  /** Collapse raw weighted rows to a multiplicity relation. Base builds
    * keep only surviving tuples (m > 0); Δ builds keep signed mass
    * (m ≠ 0) — a pure-retraction batch must carry its negatives into the
    * merge.
    */
  private def collapse(rows: DataFrame, keepNegative: Boolean): DataFrame = {
    val cols = rows.columns.filterNot(_ == "w").toSeq
    val g = rows.groupBy(cols.map(col): _*).agg(sum(col("w").cast("long")).as("m"))
    if (keepNegative) g.where(col("m") =!= 0) else g.where(col("m") > 0)
  }

  /** Bag union on all non-`m` columns; tuples summing to ≤ 0 drop.
    *
    * Tuple matching is NULL-SAFE (`<=>`): a NULL payload value must pair
    * with its index/view counterpart, exactly as `collapse`'s groupBy
    * already treats NULLs as equal — with plain equality a retraction of a
    * NULL-bearing tuple would survive as a separate negative row and be
    * dropped by the m > 0 filter, silently losing the retraction. (Join
    * KEYS follow standard SQL semantics throughout: a NULL key never
    * enters the view in `full` or `refresh`, so plain equality in
    * `bagJoin` is consistent between the two paths.)
    */
  private def mergeBags(x: DataFrame, y: DataFrame): DataFrame = {
    val cols = x.columns.filterNot(_ == "m").toSeq
    val xr = x.withColumnRenamed("m", "_mx")
    val yr = cols.foldLeft(y.withColumnRenamed("m", "_my")) {
      (d, c) => d.withColumnRenamed(c, s"_y_$c")
    }
    val cond = cols.map(c => col(c) <=> col(s"_y_$c")).reduce(_ && _)
    xr.join(yr, cond, "full_outer")
      .select(cols.map(c => coalesce(col(c), col(s"_y_$c")).as(c)) :+
        (coalesce(col("_mx"), lit(0L)) + coalesce(col("_my"), lit(0L))).as("m"): _*)
      .where(col("m") > 0)
  }

  /** Multiplicity-product join of two collapsed relations on `keys`. */
  private def bagJoin(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val out = (a.columns.filterNot(_ == "m") ++
      b.columns.filterNot(c => keys.contains(c) || c == "m")).toSeq
    a.withColumnRenamed("m", "_ma")
      .join(b.withColumnRenamed("m", "_mb"), keys)
      .select(out.map(col) :+ (col("_ma") * col("_mb")).as("m"): _*)
  }

  /** From-scratch state: index both weighted sides, join for the view. */
  def full(a: DataFrame, b: DataFrame, keys: Seq[String]): JoinState = {
    val ai = collapse(a, keepNegative = false)
    val bi = collapse(b, keepNegative = false)
    JoinState(ai, bi, bagJoin(ai, bi, keys))
  }

  /** The incremental refresh. Either delta may be an empty changelog. The
    * three delta terms use the OLD indexes — the bases are never touched.
    */
  def refresh(s: JoinState, dA: DataFrame, dB: DataFrame, keys: Seq[String]): JoinState = {
    val dAi = collapse(dA, keepNegative = true)
    val dBi = collapse(dB, keepNegative = true)
    val dView = bagJoin(dAi, s.bIdx, keys)
      .unionByName(bagJoin(s.aIdx, dBi, keys))
      .unionByName(bagJoin(dAi, dBi, keys))
    // the three terms can overlap on a tuple with mixed signs — collapse
    // to net mass before merging into the view
    val cols = dView.columns.filterNot(_ == "m").toSeq
    val dViewNet = dView.groupBy(cols.map(col): _*).agg(sum("m").as("m"))
      .where(col("m") =!= 0)
    JoinState(
      mergeBags(s.aIdx, dAi),
      mergeBags(s.bIdx, dBi),
      mergeBags(s.view, dViewNet))
  }
}
