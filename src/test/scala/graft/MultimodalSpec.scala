package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaRow, MultimodalOps, StubCodec}
import graft.sources.Tables

/** Spark-side multimodal plumbing: schema, partition-batched execution, and
  * determinism of the stub codec (decode itself is a documented STUB).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("attachMedia produces binary payload + typed metadata struct") {
    val df = MultimodalOps.attachMedia(Tables.documents(spark, dir))
    val schema = df.schema
    assert(schema("media").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height"))
    assert(df.where(col("meta.width") < 1 || col("meta.width") > 640).count() == 0)
  }

  test("decodeFeatures runs partition-batched and preserves partitioning") {
    import spark.implicits._
    val media = MultimodalOps.attachMedia(Tables.documents(spark, dir))
      .select(col("doc_id"), col("media"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .repartition(7)
      .as[MediaRow]
    val feats = MultimodalOps.decodeFeatures(spark, media)
    assert(feats.rdd.getNumPartitions == 7) // mapPartitions is narrow — no shuffle
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.content_md5.length == 32 && r.thumb_md5.length == 32))
    // frame sampling: ceil(n_bytes / 256)
    assert(rows.forall(r => r.n_frames_sampled == (if (r.n_bytes == 0) 0 else ((r.n_bytes - 1) / 256 + 1))))
  }

  test("stub codec is deterministic and matches Spark's md5") {
    val c = new StubCodec()
    val bytes = "hello graft".getBytes("UTF-8")
    assert(c.md5hex(bytes) == c.md5hex(bytes))
    assert(c.resize(bytes, 5).toSeq == bytes.take(5).toSeq)
    import spark.implicits._
    val sparkMd5 = Seq("hello graft").toDF("s").select(md5(col("s").cast("binary"))).head.getString(0)
    assert(c.md5hex(bytes) == sparkMd5)
  }
}
