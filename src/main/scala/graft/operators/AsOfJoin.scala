package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the greatest
  * `rightTs <= leftTs` within the same key — the time-series/point-in-time
  * lookup operator Spark has no built-in join type for (builder brief:
  * compose existing ops when semantics allow).
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
    * @return left rows (all columns) + `rightCols`, inner semantics: probe
    *         rows with no prior state row are dropped.
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    // working columns get a deterministic collision-free suffix so a left
    // side that already has e.g. `_ts` can't shadow them (ADVICE r1)
    val taken = (left.columns ++ right.columns).toSet
    val sfx = Iterator.from(0)
      .map(i => if (i == 0) "" else s"_$i")
      .find(s => Seq("_ts", "_side", "_state", "_latest").forall(c => !taken.contains(c + s)))
      .get
    val cTs = s"_ts$sfx"; val cSide = s"_side$sfx"; val cState = s"_state$sfx"; val cLatest = s"_latest$sfx"

    val payload = struct(col(rightTs).as(rightTs) +: rightCols.map(col): _*)
    val r = right.select(
      col(key), col(rightTs).as(cTs), lit(0).as(cSide), payload.as(cState))
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key) +: col(leftTs).as(cTs) +: lit(1).as(cSide) +:
        lit(null).cast(r.schema(cState).dataType).as(cState) +:
        leftCols.filterNot(_ == key).map(col): _*)

    val w = Window.partitionBy(key).orderBy(col(cTs), col(cSide))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select((l.columns.toSeq.map {
        case c if c == cTs || c == cSide || c == cState => col(c)
        case c if c == key => col(c)
        case c => lit(null).as(c)
      }): _*))
      .withColumn(cLatest, last(col(cState), ignoreNulls = true).over(w))
      .where(col(cSide) === 1 && col(cLatest).isNotNull)
      .select(leftCols.map(col) ++ (rightTs +: rightCols).map(c => col(s"$cLatest.$c").as(c)): _*)
  }
}
