package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert as a composition: `updates ∪ (target ⟕̸ updates)` — updated
  * keys replace their target rows, new keys insert, untouched rows carry
  * through. This is the table-format-free core of `MERGE INTO`: one
  * anti-join shuffle on the key (broadcastable when updates are small —
  * the common CDC case, where a day's changes merge into years of
  * history), then an append-shaped union.
  *
  * Idempotent persistence composes with ColdStore-style dynamic partition
  * overwrite: write the merged frame over only the partitions that contain
  * updated keys.
  */
object Upsert {

  /** @param target  current table state
    * @param updates new/changed rows (same schema); at most one row per key
    * @return merged state, one row per key
    */
  def apply(target: DataFrame, updates: DataFrame, key: Seq[String]): DataFrame =
    updates.unionByName(
      target.join(updates.select(key.map(col): _*), key, "left_anti"))
}
