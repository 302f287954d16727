package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder: collapse a timestamped
  * attribute changelog into versioned history rows
  * `(key…, attr, valid_from, valid_to, is_current)`.
  *
  * The reference stack is an Airflow warehouse ETL (payments cooled from
  * PG to object storage, `/root/reference/src/py/yq_dag.py:16-27`); the
  * canonical dimension-maintenance op its users run next to that fact
  * pipeline is SCD2 history. Supplied as a library primitive the same way
  * [[Upsert]] covers MERGE.
  *
  * Scale shape: ONE hash exchange + ONE sort. All three passes —
  * last-event-per-timestamp, no-op-change collapse, validity stitching —
  * are window functions over the SAME `(partition key, (ts, tie))`
  * ordering with filters between them, so Catalyst reuses the first
  * Exchange+Sort for every pass (filters preserve partitioning and
  * order). Nothing here is data-sized on the driver, and the shuffle key
  * is the dimension key — the natural partitioning for the downstream
  * fact join. At 100 TB the dimension changelog is the SMALL input by
  * construction (facts outnumber dimension changes); history for a
  * billion-key dimension is one shuffle of the changelog, never of facts.
  *
  * Contract: `tie` must be unique per `(key, ts)` (an event id) so "last
  * event of its timestamp" is deterministic; `attr` and `ts` must be
  * non-NULL (NULL ts has no place on a validity axis; a NULL attr would
  * need null-safe change comparison — callers scrub first).
  */
object Scd2 {

  def build(changelog: DataFrame, keys: Seq[String], attr: String,
            ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(tie))
    val keyCols = keys.map(col)
    // pass 1: keep only the last event of each (key, ts) instant
    val perInstant = changelog
      .withColumn("_nts", lead(col(ts), 1).over(w))
      .where(col("_nts").isNull || col("_nts") =!= col(ts))
    // pass 2: drop no-op changes (same attr as the surviving predecessor)
    val changed = perInstant
      .withColumn("_pattr", lag(col(attr), 1).over(w))
      .where(col("_pattr").isNull || col("_pattr") =!= col(attr))
    // pass 3: stitch validity — each version runs until the next change
    changed
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(keyCols ++ Seq(col(attr), col(ts).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current")): _*)
  }
}
