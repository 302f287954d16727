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

  /** Decode a WAV file to unsigned 8-bit PCM sample values by walking the
    * RIFF chunk structure directly (`fmt ` validated as 8-bit mono PCM,
    * `data` extracted, chunks word-aligned per the spec).
    *
    * Why not `javax.sound.sampled`: `AudioSystem.getAudioInputStream`
    * serializes EVERY call on a global provider-registry lock — measured
    * at 2% of linear scaling with 32 decode threads (32 threads decoded
    * fewer WAVs per second than one), which made the 100× audio battery
    * superlinear (0.12 → 0.37 ms/row). The direct parse is lock-free and
    * per-row-constant; [[decodeWavViaAudioSystem]] keeps the JDK path for
    * the sample-exact equivalence pin in `MultimodalSpec`.
    */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    var off = 12
    var dataOff = -1
    var dataLen = -1
    var bits = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || bits < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = le32(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"corrupt WAV chunk '$id' (len=$len)")
      if (id == "fmt ") {
        require(le16(off + 8) == 1, "only PCM WAV is supported")
        require(le16(off + 8 + 2) == 1, "only mono WAV is supported")
        bits = le16(off + 8 + 14)
      } else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(dataOff >= 0 && bits == 8, s"unsupported WAV layout (bits=$bits, data=${dataOff >= 0})")
    Array.tabulate(dataLen)(i => bytes(dataOff + i) & 0xff)
  }

  /** The `javax.sound.sampled` decode of the same payload — provider-lock
    * serialized, so NOT for the hot path; exists as the independent JDK
    * reference the direct parser is equivalence-tested against.
    */
  def decodeWavViaAudioSystem(bytes: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try ais.readAllBytes().map(b => b & 0xff)
    finally ais.close()
  }

  /** Decode EVERY frame of a real animated GIF to grayscale pixels — a
    * genuine multi-image ImageIO read (`getNumImages(true)` + per-index
    * `read(i)`), not a container split. Gray values are mapped through
    * the frame's color model (`getRGB & 0xff`), never read as raw palette
    * indices — an indexed GIF's sample IS the palette index, and nothing
    * guarantees identity ordering. Frames written by [[MediaGen.gifBytes]]
    * are full-size non-deltas, so each `read(i)` stands alone; a GIF
    * whose frames were delta-composed would need dispose-method
    * compositing here — out of scope, and `require`d against via the
    * per-frame dimension check.
    */
  def decodeGifFrames(bytes: Array[Byte]): Vector[(Int, Int, Array[Int])] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"no ImageIO reader for payload (${bytes.length} bytes)")
    val reader = readers.next()
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      require(n > 0, "empty GIF sequence")
      val w0 = reader.getWidth(0)
      val h0 = reader.getHeight(0)
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        require(w == w0 && h == h0,
          s"frame $i is ${w}x$h, not ${w0}x$h0 — delta-composed GIFs are not supported")
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        (w, h, px)
      }.toVector
    } finally {
      reader.dispose()
      iis.close()
    }
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
