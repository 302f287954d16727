package graft.multimodal

import java.io.{ByteArrayInputStream, DataInputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Real JDK-only media decoders — one instance per partition (the
  * per-batch-init pattern that amortizes decoder setup over thousands of
  * rows at scale). Replaces the former byte-level `StubCodec`: every method
  * here decodes the actual encoded bytes; none inspects the generator
  * formulas in [[MediaGen]].
  */
final class MediaCodec {
  ImageIO.setUseCache(false) // never spill decode scratch to executor tmp

  /** Decode any ImageIO-supported image (PNG/BMP/GIF/JPEG) to grayscale
    * pixels, row-major. Returns (width, height, pixels).
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, px)
  }

  /** Nearest-neighbor t×t thumbnail of a decoded grayscale image. */
  def thumbnail(px: Array[Int], w: Int, h: Int, t: Int): Array[Int] =
    Array.tabulate(t * t) { k =>
      val i = k % t // thumb column
      val j = k / t // thumb row
      px((j * h / t) * w + (i * w / t))
    }

  /** Decode a WAV file to unsigned 8-bit PCM sample values via
    * `javax.sound.sampled` (real RIFF header parsing, not byte slicing).
    */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try ais.readAllBytes().map(b => b & 0xff)
    finally ais.close()
  }

  /** Split a length-prefixed frame container (see [[MediaGen.videoBytes]])
    * into its encoded frames. Strict: a truncated container throws rather
    * than silently dropping the tail.
    */
  def splitFrames(container: Array[Byte]): Iterator[Array[Byte]] = {
    val dis = new DataInputStream(new ByteArrayInputStream(container))
    new Iterator[Array[Byte]] {
      def hasNext: Boolean = dis.available() > 0
      def next(): Array[Byte] = {
        require(dis.available() >= 4, "truncated frame container")
        val n = dis.readInt()
        require(n >= 0 && n <= dis.available(), s"corrupt frame length $n")
        val buf = new Array[Byte](n)
        dis.readFully(buf)
        buf
      }
    }
  }
}
