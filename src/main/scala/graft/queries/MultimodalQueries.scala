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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_meta" -> (m1MediaMeta _),
    "m2_decode_features" -> (m2DecodeFeatures _),
    "m3_frame_sample" -> (m3FrameSample _))

  val oracles: Map[String, String] = Map(
    "m1_media_meta" -> m1Oracle,
    "m2_decode_features" -> m2Oracle,
    "m3_frame_sample" -> m3Oracle)
}
