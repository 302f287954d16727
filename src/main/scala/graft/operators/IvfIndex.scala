package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Persistent IVF (inverted-file) ANN index — the production form of the
  * s3 query shape (`SimilarityQueries.s3IvfTopK` builds its index inline;
  * a real retrieval system builds ONCE and serves many query batches).
  *
  * Layout under `base/`:
  *  - `centroids/`   — (cid INT, cv ARRAY<DOUBLE>, cn2 DOUBLE): k cell
  *    centers, tiny (k ≤ thousands), always broadcast.
  *  - `assignments/` — (vec_id, v ARRAY<DOUBLE>, n2, cid) PARTITIONED BY
  *    cid: the inverted lists ARE the partition layout, so probing p of k
  *    cells reads p/k of the data — partition pruning does the "inverted
  *    file" seek, no row filter needed.
  *
  * Build = deterministic seeding (bottom-k by md5 of vec_id — a uniform
  * pseudo-random pick that is reproducible across runs/engines) + a few
  * Lloyd iterations done as DataFrame ops: assignment is a broadcast join
  * + per-vector rank-1 window; the centroid update is posexplode →
  * (cid, dim) average → collect_list, i.e. two narrow shuffles per round,
  * each O(n·d) — the standard distributed k-means step. At 100 TB you
  * raise `cells` (lists stay ~constant size) and the build cost stays
  * linear per iteration.
  */
final class IvfIndex private (val base: String) {

  private def centroids(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$base/centroids")

  private def assignments(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$base/assignments")

  /** Incremental index maintenance: assign a crawl increment
    * (vec_id BIGINT, embedding ARRAY<FLOAT>) to the EXISTING coarse
    * centroids and append it to the `cid=` inverted-list partitions.
    * Resident list files are never read, rewritten, or moved — the write
    * adds new parquet files inside the touched `cid=` directories
    * (SaveMode.Append under partitionBy), so an append costs O(Δ·k·d)
    * assignment + O(Δ) write regardless of corpus size, and concurrent
    * readers keep serving the old lists until the new files land.
    *
    * Centroids are NOT re-fit: with frozen centroids,
    * `build(base); append(Δ)` produces exactly the assignment
    * `build(base ⊎ Δ)` would with the same centroids (`IvfIndexSpec`
    * pins it; `s7_incremental_ivf` oracle-gates the served results).
    * Cell DRIFT is the operator's contract boundary — see SCALE.md for
    * the re-centering policy (rebuild when the appended mass or the
    * assignment-cosine distribution degrades past threshold).
    *
    * Exactly-once: a retried append would double the increment's rows;
    * production runs wrap the append in a manifest commit (the
    * `VersionedStore` pointer pattern) or dedup on vec_id at read.
    */
  def append(spark: SparkSession, increment: DataFrame): Unit = {
    graft.GraftSession.prepare(spark)
    val e = increment
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("n2", Vectors.norm2D(col("v")))
    IvfIndex.assignTo(centroids(spark), e)
      .write.mode(SaveMode.Append).partitionBy("cid").parquet(s"$base/assignments")
  }

  /** Top-k cosine neighbors for `queries` (qid, v ARRAY<DOUBLE>), probing
    * `probes` cells per query. The probed-cell union is collected to the
    * driver (bounded by the centroid count, NOT the data — ≤ k ints) and
    * pushed into the assignment scan as a partition filter, so the scan
    * reads only the probed inverted lists.
    */
  def query(spark: SparkSession, queries: DataFrame, probes: Int = 2, topK: Int = 10): DataFrame = {
    graft.GraftSession.prepare(spark)
    val cents = centroids(spark)
    val q = queries.select(col("qid"), col("v"), Vectors.norm2D(col("v")).as("qn2"))
    val probed = q.join(broadcast(cents))
      .withColumn("ccos", Vectors.cosinePre(col("v"), col("qn2"), col("cv"), col("cn2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("ccos").desc, col("cid"))))
      .where(col("crank") <= probes)
      .select(col("qid"), col("v").as("qv"), col("qn2"), col("cid"))

    val cellIds = probed.select("cid").distinct().collect().map(_.getInt(0)) // ≤ k values
    val lists = assignments(spark).where(col("cid").isin(cellIds.map(Integer.valueOf): _*))

    probed.join(lists, Seq("cid")).where(col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosinePre(col("qv"), col("qn2"), col("v"), col("n2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= topK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
  }
}

object IvfIndex {

  /** Build and persist an index over (vec_id BIGINT, embedding ARRAY<FLOAT>). */
  def build(spark: SparkSession, embeddings: DataFrame, base: String,
            cells: Int = 16, lloydIters: Int = 2): IvfIndex = {
    graft.GraftSession.prepare(spark)
    val e = embeddings
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("n2", Vectors.norm2D(col("v")))

    // deterministic uniform seeding: bottom-`cells` by key hash (the n6 rule).
    // The numbering window runs over the ≤`cells` surviving rows only — it
    // IS single-partition by construction and tiny. The partition key is a
    // constant-VALUED but non-foldable expression (empty slice of h): a
    // literal would be stripped by EliminateWindowPartitions and WindowExec
    // would then warn about a global window on every build.
    var cents = e
      .withColumn("h", md5(concat(lit("ivf:"), col("vec_id").cast("string"))))
      .orderBy("h").limit(cells)
      .withColumn("cid", (row_number().over(
        Window.partitionBy(substring(col("h"), 1, 0)).orderBy("h")) - 1).cast("int"))
      .select(col("cid"), col("v").as("cv"), col("n2").as("cn2"))
      .localCheckpoint()

    (1 to lloydIters).foreach { _ =>
      cents = assignTo(cents, e)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(avg("x").as("x"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("dim"), col("x")))).as("dx"))
        .select(col("cid"), transform(col("dx"), s => s.getField("x")).as("cv"))
        .withColumn("cn2", Vectors.norm2D(col("cv")))
        .localCheckpoint() // truncate lineage between Lloyd rounds
    }

    cents.write.mode(SaveMode.Overwrite).parquet(s"$base/centroids")
    assignTo(cents, e).write.mode(SaveMode.Overwrite)
      .partitionBy("cid").parquet(s"$base/assignments")
    new IvfIndex(base)
  }

  /** Nearest-centroid assignment: broadcast join + rank-1 window over
    * (vec_id, v, n2) rows — the one step build iterations, the final
    * assignment write, and incremental [[IvfIndex.append]] all share.
    */
  private def assignTo(cents: DataFrame, e: DataFrame): DataFrame =
    e.join(broadcast(cents))
      .withColumn("ccos", Vectors.cosinePre(col("v"), col("n2"), col("cv"), col("cn2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("n2"), col("cid"))

  def load(base: String): IvfIndex = new IvfIndex(base)
}
