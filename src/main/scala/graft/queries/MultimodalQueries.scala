package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{MediaRow, MultimodalOps}
import graft.sources.Tables

/** Multimodal-column queries: binary payload + typed metadata, and the
  * partition-batched stub decode (see MultimodalOps — decode is a
  * deterministic STUB, the Spark plumbing is real). Oracles work because
  * the corpus text is ASCII: byte-level ops on the payload equal char-level
  * SQL on the text.
  */
object MultimodalQueries {

  /** Metadata + content hash straight off the binary column (no decode). */
  def m1MediaMeta(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.attachMedia(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_md5"))
      .orderBy("doc_id")

  val m1Oracle: String =
    """SELECT doc_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
      |       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
      |       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Features through the partition-batched stub decoder (mapPartitions
    * path — exercises the typed encoder + batch shape end to end).
    */
  def m2DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = MultimodalOps.attachMedia(Tables.documents(spark, dir))
      .select(
        col("doc_id"), col("media"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
    MultimodalOps.decodeFeatures(spark, media)
      .toDF()
      .orderBy("doc_id")
  }

  val m2Oracle: String =
    """SELECT doc_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5,
      |       md5(substr(text, 1, 64)) AS thumb_md5,
      |       CAST(CASE WHEN length(text) = 0 THEN 0
      |                 ELSE (length(text) - 1) // 256 + 1 END AS INTEGER) AS n_frames_sampled
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m3: frame-sample explosion — one output row per sampled "frame"
    * (every 2nd 256-byte chunk), the row-expansion shape video pipelines
    * need (frames ≫ videos, so the explode must happen executor-side and
    * repartition freely afterwards — never a driver loop). Pure codegen'd
    * expressions: sequence → transform(substring) → posexplode.
    */
  def m3FrameSample(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.attachMedia(Tables.documents(spark, dir))
      .where(length(col("media")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, cast((length(media) - 1) / 256 as int)), i -> substring(media, i * 256 + 1, 256))")))
      .where(col("pos") % 2 === 0)
      .select(
        col("doc_id"),
        col("pos").as("frame_idx"),
        length(col("col")).cast("long").as("frame_bytes"),
        md5(col("col")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  val m3Oracle: String =
    """SELECT doc_id, CAST(f.i AS INTEGER) AS frame_idx,
      |       octet_length(encode(substr(text, CAST(f.i AS INTEGER) * 256 + 1, 256))) AS frame_bytes,
      |       md5(substr(text, CAST(f.i AS INTEGER) * 256 + 1, 256)) AS frame_md5
      |FROM documents, unnest(range(0, (octet_length(encode(text)) + 255) // 256)) AS f(i)
      |WHERE octet_length(encode(text)) > 0 AND f.i % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** m4: cross-media duplicate frames — the multimodal dedup shape (shared
    * intros/stock footage across videos): every frame is content-hashed
    * and frames appearing in ≥2 media flagged. Corpus carries synthetic
    * re-crawls (every 10th doc again under a shifted id, the d1 scenario),
    * so the duplicate set is non-trivial. One generate (frames ≫ media,
    * executor-side) + ONE shuffle on the frame hash; at 100 TB this is
    * exactly exact-dedup (d1) with frames as the unit instead of docs.
    */
  def m4FrameDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.unionByName(
      docs.where(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    MultimodalOps.attachMedia(corpus)
      .where(length(col("media")) > 0)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast((length(media) - 1) / 256 as int)), i -> substring(media, i * 256 + 1, 256))")).as("frame"))
      .groupBy(md5(col("frame")).as("frame_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), min("doc_id").as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy("frame_md5")
  }

  val m4Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
      |fr AS (
      |  SELECT doc_id, md5(substr(text, CAST(f.i AS INTEGER) * 256 + 1, 256)) AS frame_md5
      |  FROM corpus, unnest(range(0, (octet_length(encode(text)) + 255) // 256)) AS f(i)
      |  WHERE octet_length(encode(text)) > 0)
      |SELECT frame_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
      |FROM fr GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY frame_md5""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_meta" -> (m1MediaMeta _),
    "m2_decode_features" -> (m2DecodeFeatures _),
    "m3_frame_sample" -> (m3FrameSample _),
    "m4_frame_dedup" -> (m4FrameDedup _))

  val oracles: Map[String, String] = Map(
    "m1_media_meta" -> m1Oracle,
    "m2_decode_features" -> m2Oracle,
    "m3_frame_sample" -> m3Oracle,
    "m4_frame_dedup" -> m4Oracle)
}
