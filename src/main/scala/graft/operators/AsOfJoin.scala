package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single nearest right row within the
  * same key — backward (greatest `rightTs <= leftTs`, the point-in-time
  * lookup) or forward (smallest `rightTs >= leftTs`, the next-event
  * lookup), with optional tolerance and left-outer semantics: the full
  * `merge_asof` surface, an operator Spark has no built-in join type for
  * (builder brief: compose existing ops when semantics allow).
  *
  * Composition, not a nested-loop: both sides are tagged and UNIONed, then
  * one `last(..., ignoreNulls)` running window ordered by
  * `(ts, side, tiebreak)` carries the latest right payload forward into
  * each left row. Cost = ONE hash shuffle on the key + an in-partition
  * sort — the same plan a purpose-built SortMergeAsOfJoin would produce,
  * and it scales exactly like any keyed window (no per-row range probe,
  * no broadcast, skew bounded by key cardinality).
  *
  * Equal timestamps match (`>=`): the right row sorts before the left row
  * at the same instant. Right rows must be unique per (key, ts) — pre-dedup
  * upstream if not; ties would otherwise be resolved arbitrarily.
  */
object AsOfJoin {

  /** @param left       probe rows
    * @param right      state rows (unique per key+ts)
    * @param key        equi-key column name (both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param rightCols  payload columns of `right` to carry onto matches
    * @param direction  `"backward"` (greatest rightTs ≤ leftTs, the
    *                   default) or `"forward"` (smallest rightTs ≥
    *                   leftTs) — the two `merge_asof` directions; equal
    *                   timestamps match in both
    * @param toleranceMicros  optional maximum |leftTs − rightTs| in
    *                   microseconds (timestamp columns); the NEAREST
    *                   match is still picked first, then discarded if
    *                   beyond tolerance — `merge_asof` semantics
    * @param outer      false (default): inner semantics — unmatched probe
    *                   rows drop; true: left-outer — they keep NULL
    *                   payload columns
    * @return left rows (all columns) + `rightTs` + `rightCols`
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      direction: String = "backward",
      toleranceMicros: Option[Long] = None,
      outer: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"AsOfJoin direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    // working columns get a deterministic collision-free suffix so a left
    // side that already has e.g. `_ts` can't shadow them (ADVICE r1)
    val taken = (left.columns ++ right.columns).toSet
    val sfx = Iterator.from(0)
      .map(i => if (i == 0) "" else s"_$i")
      .find(s => Seq("_ts", "_side", "_state", "_latest").forall(c => !taken.contains(c + s)))
      .get
    val cTs = s"_ts$sfx"; val cSide = s"_side$sfx"; val cState = s"_state$sfx"; val cLatest = s"_latest$sfx"

    // side ordering puts the right row FIRST at an equal instant for
    // backward (so `>=` matches it via the preceding window) and LAST for
    // forward (so the following window still includes it)
    val (rSide, lSide) = if (backward) (0, 1) else (1, 0)
    val payload = struct(col(rightTs).as(rightTs) +: rightCols.map(col): _*)
    val r = right.select(
      col(key), col(rightTs).as(cTs), lit(rSide).as(cSide), payload.as(cState))
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key) +: col(leftTs).as(cTs) +: lit(lSide).as(cSide) +:
        lit(null).cast(r.schema(cState).dataType).as(cState) +:
        leftCols.filterNot(_ == key).map(col): _*)

    val ordered = Window.partitionBy(key).orderBy(col(cTs), col(cSide))
    val w =
      if (backward) ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pick =
      if (backward) last(col(cState), ignoreNulls = true).over(w)
      else first(col(cState), ignoreNulls = true).over(w)
    val probes = l.unionByName(r.select((l.columns.toSeq.map {
        case c if c == cTs || c == cSide || c == cState => col(c)
        case c if c == key => col(c)
        case c => lit(null).as(c)
      }): _*))
      .withColumn(cLatest, pick)
      .where(col(cSide) === lSide)
    val matched = toleranceMicros match {
      case None => col(cLatest).isNotNull
      case Some(t) =>
        // gap is non-negative by construction (the pick is on the probe's
        // side of the inequality), so one-sided bound suffices
        val gap =
          if (backward) unix_micros(col(cTs)) - unix_micros(col(s"$cLatest.$rightTs"))
          else unix_micros(col(s"$cLatest.$rightTs")) - unix_micros(col(cTs))
        col(cLatest).isNotNull && gap <= t
    }
    if (outer)
      probes.select(leftCols.map(col) ++ (rightTs +: rightCols).map(c =>
        when(matched, col(s"$cLatest.$c")).otherwise(lit(null)).as(c)): _*)
    else
      probes.where(matched)
        .select(leftCols.map(col) ++ (rightTs +: rightCols).map(c => col(s"$cLatest.$c").as(c)): _*)
  }
}
