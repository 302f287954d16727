package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media row: opaque bytes + typed metadata — the multimodal column model
  * (builder brief): image/audio/video payloads travel as `binary` next to a
  * metadata struct; decode happens executor-side, partition-batched.
  * Top-level case classes so encoder codegen resolves them.
  */
case class MediaRow(doc_id: Long, media: Array[Byte], format: String, width: Int, height: Int)

/** Decoded / extracted features for one media item. */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    n_bytes: Long,
    content_md5: String,
    thumb_md5: String,
    n_frames_sampled: Int)

/** Multimodal plumbing over opaque binary media columns.
  *
  * The Spark-side mechanics — schema, partition-batched execution, typed
  * encoders, deterministic output — are real and tested. The *decoders*
  * are STUBS: this container has no image/audio libraries, so
  * [[StubCodec]] stands in for the JNI/ffmpeg/turbojpeg call with a
  * deterministic byte-level fake of the same shape (documented per method).
  */
object MultimodalOps {

  private val Formats = Seq("png", "wav", "mp4")

  /** Attach a media payload + metadata struct to each document. The
    * payload is the document's UTF-8 bytes standing in for real media (the
    * corpus ships no binaries); metadata fields are derived
    * deterministically so every engine agrees on them.
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        element_at(
          array(Formats.map(lit): _*), (col("doc_id") % 3 + 1).cast("int")).as("format"),
        ((col("doc_id") % 640) + 1).cast("int").as("width"),
        ((col("doc_id") % 480) + 1).cast("int").as("height")).as("meta"))

  /** Partition-batched feature extraction: one codec instance per
    * partition (the per-batch-init pattern that amortizes decoder setup
    * over thousands of rows at scale), rows streamed through an iterator —
    * never collected.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new StubCodec() // per-partition init, like a real decoder context
      it.map { r =>
        MediaFeatures(
          doc_id = r.doc_id,
          format = r.format,
          n_bytes = r.media.length.toLong,
          content_md5 = codec.md5hex(r.media),
          thumb_md5 = codec.md5hex(codec.resize(r.media, 64)),
          n_frames_sampled = codec.sampleFrames(r.media, 256).length)
      }
    }
  }
}

/** STUB codec — deterministic byte-level stand-ins for the real decode /
  * resize / frame-sample calls (image/audio libs are absent here; in
  * production these bodies call the native decoder, the Spark plumbing
  * around them is unchanged).
  */
final class StubCodec {
  private val md = MessageDigest.getInstance("MD5")

  def md5hex(bytes: Array[Byte]): String = {
    md.reset()
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  /** STUB "resize": first `n` bytes (a real codec returns an n-thumbnail). */
  def resize(bytes: Array[Byte], n: Int): Array[Byte] =
    bytes.take(n)

  /** STUB "frame sampling": one frame per `stride` bytes. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
    bytes.grouped(stride).toSeq
}
