package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodec, MediaGen, MultimodalOps}
import graft.sources.Tables

/** Multimodal plumbing + REAL decode: payloads are genuine PNG/WAV/frame-
  * container bytes; [[MediaCodec]] decodes them with `javax.imageio` /
  * `javax.sound.sampled` and the tests assert the decoded content equals
  * the generator formula exactly (a faithful encode→decode roundtrip).
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

  test("PNG roundtrip: decoded pixels equal the generator formula exactly") {
    val codec = new MediaCodec()
    for ((seed, w, h) <- Seq((0L, 8, 8), (17L, 31, 23), (499L, 9, 11))) {
      val (dw, dh, px) = codec.decodeGray(MediaGen.pngBytes(seed, w, h))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == MediaGen.grayPixel(seed, x, y),
          s"pixel ($x,$y) seed=$seed")
    }
  }

  test("PNG bytes are a real PNG (magic header), not a byte-level stand-in") {
    val bytes = MediaGen.pngBytes(42L, 10, 10)
    assert(bytes.take(8).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
  }

  test("JPEG decode: format dispatch on real lossy bytes, luminance bounded") {
    val codec = new MediaCodec()
    for ((seed, w, h) <- Seq((3L, 24, 16), (91L, 17, 29))) {
      val bytes = MediaGen.imageBytes(seed, w, h, "jpg")
      // real JPEG container (SOI marker), not a renamed PNG
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing SOI marker")
      val (dw, dh, px) = codec.decodeGray(bytes)
      assert(dw == w && dh == h)
      // JPEG is lossy: assert bounded mean |error| vs the formula, not equality.
      // The gradient has mod-256 wrap edges (worst case for DCT ringing), so
      // the bound is loose but still far below what a wrong-image decode gives
      // (uniform-random error would average ~85).
      val errs = for (y <- 0 until h; x <- 0 until w)
        yield math.abs(px(y * w + x) - MediaGen.grayPixel(seed, x, y))
      val mean = errs.sum.toDouble / errs.size
      assert(mean < 24.0, s"mean abs luminance error $mean for seed=$seed")
    }
  }

  test("BMP decode: third container format roundtrips losslessly") {
    val codec = new MediaCodec()
    val (w, h) = (13, 7)
    val bytes = MediaGen.imageBytes(5L, w, h, "bmp")
    assert(new String(bytes.take(2), "US-ASCII") == "BM")
    val (dw, dh, px) = codec.decodeGray(bytes)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == MediaGen.grayPixel(5L, x, y))
  }

  test("WAV roundtrip: the RIFF walk recovers the exact PCM samples") {
    val codec = new MediaCodec()
    val samples = codec.decodeWav(MediaGen.wavBytes(7L, 250))
    assert(samples.length == 250)
    assert(samples.zipWithIndex.forall { case (v, i) => v == MediaGen.pcmSample(7L, i) })
    // real RIFF header
    val bytes = MediaGen.wavBytes(7L, 250)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("the hot-path RIFF walk is sample-exact vs the javax.sound decode of the same bytes") {
    // the direct parser replaced AudioSystem in the hot path (global
    // provider-registry lock: 2% of linear scaling at 32 threads); this
    // pin is what keeps it a REAL decode rather than a formula shortcut
    val codec = new MediaCodec()
    for (seed <- Seq(0L, 7L, 123456789L); n <- Seq(1, 100, 599)) {
      val bytes = MediaGen.wavBytes(seed, n)
      assert(codec.decodeWav(bytes).sameElements(codec.decodeWavViaAudioSystem(bytes)),
        s"direct RIFF walk diverged from javax.sound at seed=$seed n=$n")
    }
    // malformed payloads fail loudly, not silently
    intercept[IllegalArgumentException](codec.decodeWav(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      codec.decodeWav(MediaGen.wavBytes(7L, 100).dropRight(5)))
    // a stereo fmt chunk must be rejected, not decoded as interleaved mono
    val stereo = MediaGen.wavBytes(7L, 100)
    stereo(22) = 2 // channel count, LE16 at fmt offset +2
    intercept[IllegalArgumentException](codec.decodeWav(stereo))
    // odd-length data chunks carry the RIFF word-alignment pad byte
    assert(MediaGen.wavBytes(7L, 599).length == 44 + 599 + 1)
    assert(codec.decodeWav(MediaGen.wavBytes(7L, 599)).length == 599)
  }

  test("video container splits into frames that decode to the right pixels") {
    val codec = new MediaCodec()
    val seeds = Seq(100L, 200L, 100L)
    val frames = codec.splitFrames(MediaGen.videoBytes(seeds, 16, 12)).toSeq
    assert(frames.length == 3)
    frames.zip(seeds).foreach { case (png, seed) =>
      val (w, h, px) = codec.decodeGray(png)
      assert(w == 16 && h == 12)
      assert(px(5 * 16 + 3) == MediaGen.grayPixel(seed, 3, 5))
    }
    // identical seeds produce identical frame bytes (dedup-able content)
    assert(frames(0).toSeq == frames(2).toSeq)
  }

  test("animated GIF: real multi-frame bytes, every frame decoded pixel-exactly") {
    val codec = new MediaCodec()
    val seeds = Seq(100L, 200L, 300L, 100L)
    val bytes = MediaGen.gifBytes(seeds, 16, 12)
    // genuine GIF container: magic header + the NETSCAPE-free multi-image stream
    assert(bytes.take(6).map(_.toChar).mkString == "GIF89a" ||
      bytes.take(6).map(_.toChar).mkString == "GIF87a",
      s"not a GIF header: ${bytes.take(6).toSeq}")

    val frames = codec.decodeGifFrames(bytes)
    assert(frames.length == seeds.length, "every frame of the sequence must decode")
    frames.zip(seeds).foreach { case ((w, h, px), seed) =>
      assert(w == 16 && h == 12)
      // EVERY pixel of EVERY frame equals the generator formula — the
      // 256-level gray palette round-trips losslessly through the codec
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == MediaGen.grayPixel(seed, x, y),
          s"pixel ($x,$y) of seed-$seed frame")
    }
    // repeated seed → identical decoded frames (the m4 dedup signal)
    assert(frames(0)._3.toSeq == frames(3)._3.toSeq)
    assert(frames(0)._3.toSeq != frames(1)._3.toSeq)

    // corrupt payloads fail loudly
    intercept[IllegalArgumentException](codec.decodeGifFrames(Array[Byte](1, 2, 3)))
  }

  test("decodedFrameLuma preserves container order: frame_idx follows the seed sequence") {
    import spark.implicits._
    // m9's whole contract is TEMPORAL: frame_idx must be the container
    // position (decodedFrameFingerprints deliberately drops order). Seeds
    // with strictly increasing luminance mass pin the mapping: if the
    // decode reordered frames, the per-index luma would not match the
    // per-seed formula.
    val seeds = Seq(100L, 200L, 300L, 100L)
    val vids = Seq(graft.multimodal.PayloadRow(7L, MediaGen.gifBytes(seeds, 16, 12))).toDS()
    val got = MultimodalOps.decodedFrameLuma(spark, vids)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    got.foreach { fl =>
      val seed = seeds(fl.frame_idx)
      val expect = (for (y <- 0 until 12; x <- 0 until 16)
        yield MediaGen.grayPixel(seed, x, y).toLong).sum
      assert(fl.luma_sum == expect, s"frame ${fl.frame_idx} luma")
    }
    // identical seeds at different positions stay distinguishable BY
    // POSITION while agreeing in content — the property the scene-cut lag
    // window rides on
    assert(got(0).luma_sum == got(3).luma_sum)
  }

  test("thumbnail is nearest-neighbor on decoded pixels (hand case)") {
    val codec = new MediaCodec()
    // 4x4 image, thumbnail 2x2 picks pixels at (0,0),(2,0),(0,2),(2,2)
    val px = Array.tabulate(16)(identity)
    assert(codec.thumbnail(px, 4, 4, 2).toSeq == Seq(0, 2, 8, 10))
  }

  test("decodeImageFeatures is partition-batched, narrow, and formula-exact") {
    val imgs = MultimodalOps.syntheticImages(spark, Tables.documents(spark, dir)).repartition(7)
    val feats = MultimodalOps.decodeImageFeatures(spark, imgs)
    assert(feats.rdd.getNumPartitions == 7) // mapPartitions is narrow — no shuffle
    val rows = feats.collect()
    assert(rows.length == 500)
    // cross-check one row against the formula computed independently here
    val r = rows.find(_.doc_id == 13L).get
    val (w, h) = ((13 % 24 + 8), (13 % 16 + 8))
    assert(r.width == w && r.height == h)
    val expLum = (for (y <- 0 until h; x <- 0 until w) yield MediaGen.grayPixel(13L, x, y).toLong).sum
    assert(r.lum_sum == expLum)
  }

  test("dHash on real decoded PNGs: brightness-edit invariant, seed-distinct, px_fp variant") {
    import spark.implicits._
    val seeds = (0L until 50L)
    val plain = seeds.map(s => graft.multimodal.PayloadRow(s, MediaGen.texturedPngBytes(s, 0, 24, 16)))
    val edited = seeds.map(s => graft.multimodal.PayloadRow(s, MediaGen.texturedPngBytes(s, 1, 24, 16)))
    val hp = MultimodalOps.decodeDHash(spark, spark.createDataset(plain)).collect()
      .map(r => r.doc_id -> r).toMap
    val he = MultimodalOps.decodeDHash(spark, spark.createDataset(edited)).collect()
      .map(r => r.doc_id -> r).toMap
    // the +1 uniform edit never moves a dHash bit but always moves the exact fp
    assert(seeds.forall(s => hp(s).dhash == he(s).dhash))
    assert(seeds.forall(s => hp(s).px_fp != he(s).px_fp))
    // and distinct textures land on distinct hashes (no phase-collapse degeneracy)
    assert(hp.values.map(_.dhash).toSet.size == 50)
  }

  test("corrupt image bytes fail loudly, not silently") {
    val codec = new MediaCodec()
    intercept[IllegalArgumentException](codec.decodeGray(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](codec.splitFrames(Array[Byte](0, 0)).next())
  }
}
