package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, DataOutputStream}

import javax.imageio.ImageIO

/** Deterministic synthetic-media fixture (builder brief: multimodal columns).
  *
  * The corpus ships no binary media, so each document's payload is generated
  * executor-side as REAL encoded bytes — a true PNG (via `javax.imageio`), a
  * true RIFF/WAVE file (canonical header, `javax.sound`-readable — pinned in
  * `MultimodalSpec`), or a length-prefixed
  * container of PNG frames standing in for a video. Pixel/sample values are
  * closed-form functions of the seed, so the DuckDB oracle can compute the
  * expected decoded features *without* decoding anything: if Spark's
  * encode→decode roundtrip were unfaithful, the feature hashes would
  * mismatch. Generation is pure in the seed — safe under task retries.
  */
object MediaGen {

  /** Gray value at (x, y) for a given seed — the formula the oracle mirrors. */
  def grayPixel(seed: Long, x: Int, y: Int): Int =
    ((seed * 7 + x * 3 + y * 5) % 256).toInt

  /** PCM sample i for a given seed (8-bit unsigned) — oracle-mirrored. */
  def pcmSample(seed: Long, i: Int): Int =
    ((seed * 11 + i * 17) % 256).toInt

  /** A real 8-bit grayscale PNG whose pixels follow [[grayPixel]]. */
  def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] =
    imageBytes(seed, w, h, "png")

  /** A real RIFF/WAVE file: 8 kHz mono 8-bit unsigned PCM, samples from
    * [[pcmSample]]. The canonical 44-byte header is written directly —
    * `AudioSystem.write` serializes on the same global provider-registry
    * lock as the read side (see `MediaCodec.decodeWav`), which kept m5's
    * per-row cost lock-bound at scale. `MultimodalSpec` pins that
    * `javax.sound` can still decode these bytes sample-exactly, so the
    * payload stays a genuine WAVE file, not a formula shortcut.
    */
  def wavBytes(seed: Long, nSamples: Int): Array[Byte] = {
    // RIFF chunks are word-aligned: an odd-length data chunk carries a
    // trailing zero pad byte, counted in the RIFF size but not the chunk's
    val pad = nSamples & 1
    val out = new Array[Byte](44 + nSamples + pad)
    def ascii(o: Int, s: String): Unit = { var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 } }
    def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def le32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + nSamples + pad); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, 8000) // sample rate
    le32(28, 8000) // byte rate (8-bit mono)
    le16(32, 1) // block align
    le16(34, 8) // bits per sample
    ascii(36, "data"); le32(40, nSamples)
    var i = 0
    while (i < nSamples) { out(44 + i) = pcmSample(seed, i).toByte; i += 1 }
    out
  }

  /** The same grayscale image in any other ImageIO-writable format
    * ("jpg", "bmp", "gif") — exercises [[MediaCodec.decodeGray]]'s format
    * dispatch on genuinely different containers. JPEG is lossy: callers
    * must assert bounded (not bit-equal) luminance against [[grayPixel]].
    */
  def imageBytes(seed: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, grayPixel(seed, x, y)); x += 1 }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    require(ImageIO.write(img, format, baos), s"no ImageIO writer for $format")
    baos.toByteArray
  }

  /** Textured gray value for the perceptual-hash fixture (m6): quadratic
    * and cross terms make the horizontal step depend on position, and the
    * seed·x / seed·y terms put the SEED into the gradient itself (a ramp
    * linear in x — [[grayPixel]] — steps by a constant mod 255, and a
    * seed entering only additively shifts the phase: either way the
    * gradient-sign pattern collapses to ≤255 classes and unrelated seeds
    * collide into one dHash; verified 50/50 distinct hashes here).
    * `pert` models a uniform brightness edit: dHash compares neighbors, so
    * it cancels; pixel fingerprints see it. Base range 0..254, so +1 never
    * wraps. Oracle-mirrored.
    */
  def texturedPixel(seed: Long, pert: Int, x: Int, y: Int): Int =
    ((seed * 2654435761L + x * x * 40503L + y * y * 9973L + x * y * 7919L
      + seed * x * 12007L + seed * y * 3571L) % 255).toInt + pert

  /** [[texturedPixel]] with a VARIANT class for the banded-hamming
    * fixture (m7): 0 = plain, 1 = uniform +1 brightness (dHash-invariant),
    * 2 = a localized +128 flip at pixel (10, 6) — a sampled dHash grid
    * site, so exactly the ≤2 comparison bits that touch that cell move:
    * a small, nonzero hamming distance the band join must still catch.
    */
  def texturedPixelVariant(seed: Long, variant: Int, x: Int, y: Int): Int = {
    val base = texturedPixel(seed, 0, x, y)
    variant match {
      case 1                        => base + 1
      case 2 if x == 10 && y == 6   => (base + 128) % 255
      case _                        => base
    }
  }

  /** A real grayscale PNG whose pixels follow [[texturedPixelVariant]]. */
  def texturedVariantPngBytes(seed: Long, variant: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, texturedPixelVariant(seed, variant, x, y)); x += 1 }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    require(ImageIO.write(img, "png", baos), "no ImageIO writer for png")
    baos.toByteArray
  }

  /** A real grayscale PNG whose pixels follow [[texturedPixel]]. */
  def texturedPngBytes(seed: Long, pert: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, texturedPixel(seed, pert, x, y)); x += 1 }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    require(ImageIO.write(img, "png", baos), "no ImageIO writer for png")
    baos.toByteArray
  }

  /** A "video": length-prefixed concatenation of real PNG frames (the
    * MJPEG-style container shape — each frame independently decodable, so
    * frame extraction parallelizes without a stateful demuxer).
    */
  def videoBytes(frameSeeds: Seq[Long], w: Int, h: Int): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(baos)
    frameSeeds.foreach { s =>
      val png = pngBytes(s, w, h)
      dos.writeInt(png.length)
      dos.write(png)
    }
    dos.flush()
    baos.toByteArray
  }

  /** A REAL animated GIF: one image-sequence stream written with the JDK
    * GIF writer, every frame a FULL (non-delta) 8-bit grayscale image
    * whose pixels follow [[grayPixel]] per frame seed. 256 gray levels
    * fit GIF's 8-bit palette exactly, so the round-trip is lossless —
    * `MultimodalSpec` pins per-frame pixel equality against the formula.
    * This is the m-family's genuine multi-frame container (m4's fixture);
    * the length-prefixed [[videoBytes]] remains as the demuxer-free
    * MJPEG-style shape.
    */
  def gifBytes(frameSeeds: Seq[Long], w: Int, h: Int): Array[Byte] = {
    val writers = ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no ImageIO writer for gif")
    val writer = writers.next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameSeeds.foreach { s =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, grayPixel(s, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }
}
