package graft.multimodal

/** Pure-JVM media codecs for the multimodal pipeline: BMP (24-bit
  * uncompressed) and PPM (P6) for images/frames, WAV (PCM unsigned
  * 8-bit mono) for audio. No library dependencies — the formats are
  * simple enough that a few hundred lines make the decode step REAL
  * instead of a labeled stub, while staying deterministic and
  * oracle-predictable.
  *
  * The decoded payload is always a raster in CANONICAL order: RGB
  * interleaved, rows top-down, left-to-right (samples in time order for
  * WAV). That canonicalization is where the formats earn their keep as a
  * correctness surface: BMP stores rows BOTTOM-UP in BGR with each row
  * padded to a 4-byte boundary, so a decoder that forgets the row flip,
  * the channel swap, or the padding skip produces the same byte
  * MULTISET but a different byte ORDER — caught by the order-sensitive
  * weighted checksum the oracle queries fold over the decoded raster.
  *
  * Reference: the pipeline position mirrors the news image fetch the
  * reference renders client-side (SearchUI.js:80-84 shows `img` URLs;
  * decode there happens in the browser) — here the decode is a
  * first-class distributed stage instead.
  */
object ImageCodec {

  /** A decoded payload: `kind` ∈ bmp|ppm|wav; for images `data` is the
    * RGB raster top-down; for wav, `width`=sample count, `height`=1,
    * `data`=samples. */
  final case class Decoded(kind: String, width: Int, height: Int,
      data: Array[Byte])

  // ---- BMP (Windows BITMAPINFOHEADER, 24 bpp, BI_RGB) ----

  private def bmpRowSize(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Encode an RGB top-down raster as a 24-bit BMP: 14-byte file header,
    * 40-byte info header, rows written bottom-up in BGR, padded to 4
    * bytes. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"raster ${rgb.length} != 3*$w*$h")
    val rowSize = bmpRowSize(w)
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, size); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, h)
    out(26) = 1; out(28) = 24 // planes, bpp (LE u16)
    put32(34, rowSize * h)
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val src = (y * w + x) * 3
        out(dstRow + x * 3) = rgb(src + 2)     // B
        out(dstRow + x * 3 + 1) = rgb(src + 1) // G
        out(dstRow + x * 3 + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def get32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode a 24-bit uncompressed BMP to the canonical RGB top-down
    * raster (undoing bottom-up rows, BGR order, and row padding).
    * Negative biHeight (top-down storage) is honored too. */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOff = get32(bytes, 10)
    val w = get32(bytes, 18)
    val rawH = get32(bytes, 22)
    val bottomUp = rawH > 0
    val h = math.abs(rawH)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    val compression = get32(bytes, 30)
    require(bpp == 24 && compression == 0, s"unsupported BMP (bpp=$bpp, comp=$compression)")
    val rowSize = bmpRowSize(w)
    require(bytes.length >= dataOff + rowSize * h, "truncated BMP pixel array")
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (bottomUp) (h - 1 - y) else y) * rowSize
      var x = 0
      while (x < w) {
        val dst = (y * w + x) * 3
        rgb(dst) = bytes(srcRow + x * 3 + 2)     // R
        rgb(dst + 1) = bytes(srcRow + x * 3 + 1) // G
        rgb(dst + 2) = bytes(srcRow + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Decoded("bmp", w, h, rgb)
  }

  // ---- PPM (P6 binary, maxval 255) ----

  /** Encode an RGB raster as binary PPM: `P6\n<w> <h>\n255\n` + bytes
    * (already in canonical order — PPM is top-down RGB natively). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"raster ${rgb.length} != 3*$w*$h")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode one P6 frame starting at `start`; returns the frame plus
    * the offset of the byte after its raster (where the next frame of a
    * concatenated-P6 video stream begins). */
  private def decodePpmAt(bytes: Array[Byte], start: Int): (Decoded, Int) = {
    require(bytes.length >= start + 2 && bytes(start) == 'P' && bytes(start + 1) == '6',
      "not a P6 PPM")
    var i = start + 2
    def nextInt(): Int = {
      while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      var v = 0
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9', "bad PPM header")
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"unsupported PPM maxval $maxval")
    i += 1 // single whitespace after maxval, then raster
    require(bytes.length >= i + 3 * w * h, "truncated PPM raster")
    (Decoded("ppm", w, h, java.util.Arrays.copyOfRange(bytes, i, i + 3 * w * h)),
      i + 3 * w * h)
  }

  /** Decode binary PPM: parse the three whitespace-separated header
    * ints (width, height, maxval) then read the raster verbatim. */
  def decodePpm(bytes: Array[Byte]): Decoded = decodePpmAt(bytes, 0)._1

  /** Decode a concatenated-P6 video stream (the raw-video convention:
    * frames back-to-back, each with its own header) into its frames, in
    * stream order. */
  def decodePpmStream(bytes: Array[Byte]): Seq[Decoded] = {
    val frames = Seq.newBuilder[Decoded]
    var off = 0
    while (off < bytes.length) {
      val (frame, next) = decodePpmAt(bytes, off)
      frames += frame
      off = next
    }
    frames.result()
  }

  // ---- WAV (RIFF, PCM, 1 channel, 8-bit unsigned) ----

  /** Encode samples as a minimal 44-byte-header PCM WAV. */
  def encodeWav(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val out = new Array[Byte](44 + samples.length)
    def putStr(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) => out(off + k) = b }
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putStr(0, "RIFF"); put32(4, 36 + samples.length); putStr(8, "WAVE")
    putStr(12, "fmt "); put32(16, 16); put16(20, 1) // PCM
    put16(22, 1); put32(24, sampleRate); put32(28, sampleRate) // mono, 1 B/sample
    put16(32, 1); put16(34, 8) // block align, bits
    putStr(36, "data"); put32(40, samples.length)
    System.arraycopy(samples, 0, out, 44, samples.length)
    out
  }

  /** Decode PCM WAV by walking RIFF chunks to `data` (tolerating extra
    * chunks before it, as real encoders emit). */
  def decodeWav(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F', "not a RIFF WAV")
    var i = 12
    var data: Array[Byte] = null
    while (data == null && i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val len = get32(bytes, i + 4)
      if (id == "data") {
        require(bytes.length >= i + 8 + len, "truncated WAV data chunk")
        data = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + len)
      } else if (id == "fmt ") {
        val fmt = (bytes(i + 8) & 0xff) | ((bytes(i + 9) & 0xff) << 8)
        val bits = (bytes(i + 22) & 0xff) | ((bytes(i + 23) & 0xff) << 8)
        require(fmt == 1 && bits == 8, s"unsupported WAV (fmt=$fmt, bits=$bits)")
        i += 8 + len + (len & 1)
      } else i += 8 + len + (len & 1)
    }
    require(data != null, "WAV has no data chunk")
    Decoded("wav", data.length, 1, data)
  }

  /** Nearest-neighbor resize of an RGB raster: out(ty,tx,c) =
    * src(⌊ty·h/oh⌋, ⌊tx·w/ow⌋, c). */
  def resizeRaster(w: Int, h: Int, rgb: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](3 * ow * oh)
    var ty = 0
    while (ty < oh) {
      val sy = ty * h / oh
      var tx = 0
      while (tx < ow) {
        val sx = tx * w / ow
        val src = (sy * w + sx) * 3
        val dst = (ty * ow + tx) * 3
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Nearest-neighbor resample of a sample stream to `outN` samples:
    * out(k) = src(⌊k·n/outN⌋). */
  def resample(samples: Array[Byte], outN: Int): Array[Byte] =
    Array.tabulate(outN)(k => samples(((k.toLong * samples.length) / outN).toInt))

  /** Dispatch on the container magic. */
  def decode(bytes: Array[Byte]): Decoded =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') decodeWav(bytes)
    else throw new IllegalArgumentException(
      s"unrecognized media container (first bytes: ${bytes.take(4).mkString(",")})")
}
