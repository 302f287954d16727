package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` corpus
  * (builder brief; SURVEY.md §7.1 step 7).
  *
  *  - [[s1BruteTopK]] is the exact baseline: block cross-join + windowed
  *    top-k. Quadratic — correct at any SF, affordable only because the
  *    query block is bounded.
  *  - [[s2LshTopK]] is the scale path: 8 deterministic random-hyperplane
  *    signs bucket the corpus (expected bucket ≈ n/256); queries compare
  *    only within their bucket. The bucket id is an equi-join key, so at
  *    100 TB this is one hash-partitioned shuffle instead of a cross join.
  *
  * Hyperplane weights derive from md5 (same integers in the DuckDB oracle),
  * so bucket assignment — and therefore the whole result — is reproducible
  * across engines.
  */
object SimilarityQueries {

  private val Dim = 64
  private val Planes = 8
  private val TopK = 5
  private val QueryBlock = 50 // vec_id < 50 are the query vectors

  /** Deterministic hyperplane weight w(p,d) ∈ [-1, 1]: md5-derived integer
    * in [-1000, 1000] divided by 1000 — exactly the arithmetic the oracle
    * repeats in SQL.
    */
  private[queries] def weightInt(p: Int, d: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"w:$p:$d".getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2001 - 1000
  }

  private def planeCol(p: Int): Column =
    array((0 until Dim).map(d => lit(weightInt(p, d)).cast("double") / lit(1000.0)): _*)

  /** 8-bit LSH bucket of an already-double embedding: bit p = [dot(v, w_p) > 0]. */
  private def bucketCol(v: Column): Column =
    (0 until Planes).map { p =>
      when(Vectors.dotD(v, planeCol(p)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def bucketSql(vExpr: String): String =
    (0 until Planes).map { p =>
      val dot = s"list_reduce(list_prepend(0.0, list_transform(list_zip($vExpr, ${planeSql(p)}), s -> s[1] * s[2])), (x, y) -> x + y)"
      s"CASE WHEN $dot > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("(", " + ", ")")

  private def planeSql(p: Int): String =
    (0 until Dim).map(d => s"${weightInt(p, d)} / 1000.0").mkString("[", ", ", "]")

  private val cosSql: String =
    "list_reduce(list_prepend(0.0, list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])), (x, y) -> x + y)" +
      " / sqrt(list_reduce(list_prepend(0.0, list_transform(a.v, x -> x * x)), (x, y) -> x + y)" +
      " * list_reduce(list_prepend(0.0, list_transform(b.v, x -> x * x)), (x, y) -> x + y))"

  /** Exact top-k: query block × corpus, cosine, windowed rank. Arrays are
    * widened and norms computed once per vector before the pair join.
    */
  def s1BruteTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.prepare(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("n2", Vectors.norm2D(col("v")))
    val q = e.select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
      .where(col("qid") < QueryBlock)
    val scored = q.join(e, col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosinePre(col("qv"), col("qn2"), col("v"), col("n2")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
      .orderBy("qid", "rank")
  }

  val s1Oracle: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id qid, b.vec_id nid, $cosSql AS cos
       |  FROM e a JOIN e b ON a.vec_id < $QueryBlock AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, nid, CAST(rank AS INTEGER) AS rank, cos FROM ranked WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  /** LSH-bucketed ANN: bucket both sides on the 8-bit hyperplane signature,
    * equi-join on the bucket, rank within it. Approximate (recall < 1) but
    * deterministic; the spec quantifies recall against [[s1BruteTopK]].
    */
  def s2LshTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.prepare(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("n2", Vectors.norm2D(col("v")))
      .withColumn("bucket", bucketCol(col("v")))
    val q = e.where(col("vec_id") < QueryBlock)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"), col("bucket"))
    val scored = q.join(e, Seq("bucket")).where(col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosinePre(col("qv"), col("qn2"), col("v"), col("n2")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
      .orderBy("qid", "rank")
  }

  val s2Oracle: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
       |eb AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e),
       |scored AS (
       |  SELECT a.vec_id qid, b.vec_id nid, $cosSql AS cos
       |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < $QueryBlock AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, nid, CAST(rank AS INTEGER) AS rank, cos FROM ranked WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  private val Cells = 16   // IVF centroid count
  private val Probes = 2   // cells probed per query

  /** IVF ANN: an inverted-file index with deterministic "centroids" (the
    * first 16 vectors — a k-means stand-in that keeps the oracle exact).
    * Every vector is assigned to its nearest centroid (the inverted
    * lists); a query probes its `Probes` nearest cells and ranks only
    * their members. At scale the assignment is one broadcast-map pass and
    * the probe is an equi-join on cell id — the IVF trade: recall vs the
    * fraction of lists touched.
    */
  def s3IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.prepare(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("n2", Vectors.norm2D(col("v")))
    val cents = e.where(col("vec_id") < Cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))

    // nearest-centroid assignment (rank 1) and per-query probe list (rank <= Probes)
    def cellRank(of: DataFrame, idCol: String) = of.join(broadcast(cents))
      .withColumn("ccos", Vectors.cosinePre(col("v"), col("n2"), col("cv"), col("cn2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))))

    val assigned = cellRank(e, "vec_id").where(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("n2"), col("cid"))
    val probes = cellRank(e.where(col("vec_id") < QueryBlock), "vec_id").where(col("crank") <= Probes)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"), col("cid"))

    val scored = probes.join(assigned, Seq("cid")).where(col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosinePre(col("qv"), col("qn2"), col("v"), col("n2")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
      .orderBy("qid", "rank")
  }

  val s3Oracle: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $Cells),
       |ranked_cells AS (
       |  SELECT a.vec_id, b.cid, $cosSqlAB AS ccos,
       |         row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosSqlAB DESC, b.cid) AS crank
       |  FROM e a CROSS JOIN c b),
       |assigned AS (SELECT vec_id, cid FROM ranked_cells WHERE crank = 1),
       |probes AS (SELECT vec_id AS qid, cid FROM ranked_cells WHERE crank <= $Probes AND vec_id < $QueryBlock),
       |scored AS (
       |  SELECT p.qid, x.vec_id nid, $cosSqlQX AS cos
       |  FROM probes p JOIN assigned x ON p.cid = x.cid AND x.vec_id <> p.qid
       |  JOIN e a ON a.vec_id = p.qid JOIN e b ON b.vec_id = x.vec_id),
       |fin AS (
       |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, nid, CAST(rank AS INTEGER) AS rank, cos FROM fin WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  private def cosSqlAB: String =
    "list_reduce(list_prepend(0.0, list_transform(list_zip(a.v, b.cv), s -> s[1] * s[2])), (x, y) -> x + y)" +
      " / sqrt(list_reduce(list_prepend(0.0, list_transform(a.v, x -> x * x)), (x, y) -> x + y)" +
      " * list_reduce(list_prepend(0.0, list_transform(b.cv, x -> x * x)), (x, y) -> x + y))"

  private def cosSqlQX: String = cosSql

  /** s4: retrieval hydration — the RAG shape: ANN top-k ids joined back to
    * the document store for text snippets. The k·|queries| hit list is
    * tiny next to the corpus, so the hydrate join broadcasts the hits and
    * never shuffles the documents.
    */
  def s4AnnRetrieve(spark: SparkSession, dir: String): DataFrame = {
    val hits = s1BruteTopK(spark, dir).select(col("qid"), col("nid"), col("rank"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("nid"), col("lang"), substring(col("text"), 1, 80).as("snippet"))
    hits.join(docs, "nid")
      .select(col("qid"), col("rank"), col("nid"), col("lang"), col("snippet"))
      .orderBy("qid", "rank")
  }

  val s4Oracle: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id qid, b.vec_id nid, $cosSql AS cos
       |  FROM e a JOIN e b ON a.vec_id < $QueryBlock AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored),
       |topk AS (SELECT qid, nid, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= $TopK)
       |SELECT t.qid, t.rank, t.nid, d.lang, substr(d.text, 1, 80) AS snippet
       |FROM topk t JOIN documents d ON d.doc_id = t.nid
       |ORDER BY qid, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_brute_topk" -> (s1BruteTopK _),
    "s2_lsh_topk" -> (s2LshTopK _),
    "s3_ivf_topk" -> (s3IvfTopK _),
    "s4_ann_retrieve" -> (s4AnnRetrieve _))

  val oracles: Map[String, String] = Map(
    "s1_brute_topk" -> s1Oracle,
    "s2_lsh_topk" -> s2Oracle,
    "s3_ivf_topk" -> s3Oracle,
    "s4_ann_retrieve" -> s4Oracle)
}
