package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join techniques for the 100 TB tier (builder brief): bucketing to
  * pre-shuffle fact tables once at write time, and key salting to spread a
  * skewed build side when AQE's runtime splitting isn't available (e.g.
  * deterministic plans, or skew known up front).
  */
object ScaleJoins {

  /** Write both sides bucketed by the join key into the session catalog:
    * every future equi-join on `key` between them is shuffle-free (the
    * exchange happens once, at write). This is how repeated fact⋈fact
    * joins amortize at scale — `numBuckets` matches the executor-count
    * order of magnitude.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // idempotent: clear the catalog entry AND any orphaned location left by
    // a previous process (overwrite alone refuses a dangling directory).
    // Resolve the real location from the catalog while the entry exists;
    // only fall back to the default-database warehouse layout for an
    // unqualified name (ADVICE r1: raw $warehouse/$table concat can miss a
    // non-default-db table or hit an unrelated directory).
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val catalog = spark.sessionState.catalog
    val loc =
      if (catalog.tableExists(ident)) Some(catalog.getTableMetadata(ident).location.toString)
      else if (!table.contains(".")) Some(s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
      else None
    spark.sql(s"DROP TABLE IF EXISTS $table")
    loc.foreach(graft.sources.FsUtil.delete(spark, _))
    // one file per bucket: repartition on the key with numBuckets
    // partitions uses the same pmod(murmur3, n) routing as the bucket-id
    // assignment, so each write task holds exactly one bucket's rows.
    // Without this the writer fans out to (input partitions × buckets)
    // files — the 61-month corpus at 32 buckets produced hundreds of tiny
    // files per year table, and the "zero-Exchange" reconcile lost its
    // win to open/footer overhead on the scan side. This shuffle IS the
    // pay-once-at-write-time exchange the layout advertises.
    df.repartition(numBuckets, col(key))
      .write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Salted equi-join for a skewed LEFT side: the right side is replicated
    * `saltFactor` ways, the left side scatters its hot keys uniformly over
    * the replicas, and the join key becomes (key, salt) — the worst
    * partition shrinks by ~saltFactor. Correctness is unchanged: every
    * left row still meets exactly one copy of each matching right row.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltFactor: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
