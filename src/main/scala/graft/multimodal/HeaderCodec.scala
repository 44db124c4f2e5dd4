package graft.multimodal

/** Real decoders for self-describing media formats whose metadata
  * lives entirely in the header — no external media library needed.
  * These run inside [[MultiModal.decodeFeatures]]'s mapPartitions
  * seam; payloads that match neither format fall back to the
  * deterministic [[MultiModal.StubCodec]] so the plumbing stays
  * testable on the text-bytes corpus.
  *
  * Formats:
  *  - PPM `P6` (binary Portable Pixmap): ASCII header
  *    `P6 <width> <height> <maxval>` with `#` comments, then the RGB
  *    raster. Parsed per the Netpbm format description.
  *  - WAV PCM (RIFF): `RIFF....WAVE` container; the `fmt ` chunk
  *    carries channels / sample rate / bits-per-sample, the `data`
  *    chunk length gives the sample count, hence duration.
  */
object HeaderCodec {

  final case class PpmMeta(width: Int, height: Int, maxval: Int)

  final case class WavMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      dataBytes: Long) {
    /** Milliseconds of audio, floor — exact integer arithmetic. */
    def durationMs: Long = {
      val byteRate =
        sampleRate.toLong * channels.toLong * (bitsPerSample / 8).toLong
      if (byteRate <= 0) 0L else dataBytes * 1000L / byteRate
    }
  }

  /** Parse a binary PPM (`P6`) header; None unless the payload is a
    * structurally valid PPM with a complete raster.
    */
  def decodePpm(p: Array[Byte]): Option[PpmMeta] =
    decodePpmOffset(p).map(_._1)

  /** Decode the full raster to per-pixel integer luma, row-major:
    * luma = (r + g + b) / 3, floor — exact integer arithmetic, and the
    * identity for grayscale (r = g = b) rasters. 16-bit rasters
    * (maxval >= 256) read big-endian per the Netpbm spec. This is the
    * real pixel path under the perceptual-hash entries: the signature
    * is computed from DECODED pixels, never payload bytes.
    */
  def decodePpmGray(p: Array[Byte]): Option[(PpmMeta, Array[Int])] =
    decodePpmOffset(p).map { case (meta, off) =>
      val n = meta.width * meta.height
      val gray = new Array[Int](n)
      if (meta.maxval < 256) {
        var i = 0
        while (i < n) {
          val b = off + 3 * i
          gray(i) = ((p(b) & 0xff) + (p(b + 1) & 0xff) +
            (p(b + 2) & 0xff)) / 3
          i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val b = off + 6 * i
          def s16(j: Int): Int = ((p(j) & 0xff) << 8) | (p(j + 1) & 0xff)
          gray(i) = (s16(b) + s16(b + 2) + s16(b + 4)) / 3
          i += 1
        }
      }
      (meta, gray)
    }

  /** Header parse returning the raster's byte offset alongside the
    * metadata (shared by [[decodePpm]] and [[decodePpmGray]]).
    */
  private def decodePpmOffset(p: Array[Byte]): Option[(PpmMeta, Int)] = {
    if (p.length < 9 || p(0) != 'P' || p(1) != '6') return None
    var i = 2
    // after the magic: three ASCII ints separated by whitespace, with
    // '#'-to-end-of-line comments allowed anywhere between tokens
    def skipSeparators(): Boolean = {
      var sawAny = false
      var go = true
      while (go && i < p.length) {
        val c = p(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
          i += 1; sawAny = true
        } else if (c == '#') {
          while (i < p.length && p(i) != '\n') i += 1
          sawAny = true
        } else go = false
      }
      sawAny
    }
    def readInt(): Int = { // -1 on malformed / overflow
      if (i >= p.length || p(i) < '0' || p(i) > '9') return -1
      var v = 0L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0')
        if (v > Int.MaxValue) return -1
        i += 1
      }
      v.toInt
    }
    if (!skipSeparators()) return None
    val w = readInt()
    if (w <= 0 || !skipSeparators()) return None
    val h = readInt()
    if (h <= 0 || !skipSeparators()) return None
    val maxval = readInt()
    if (maxval <= 0 || maxval >= 65536) return None
    // exactly ONE whitespace byte ends the header before the raster
    if (i >= p.length) return None
    val c = p(i)
    if (c != ' ' && c != '\t' && c != '\n' && c != '\r') return None
    i += 1
    val bytesPerSample = if (maxval < 256) 1 else 2
    val need = w.toLong * h.toLong * 3L * bytesPerSample
    if (p.length - i < need) None else Some((PpmMeta(w, h, maxval), i))
  }

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE PCM header; None unless both the `fmt ` and
    * `data` chunks are present and self-consistent.
    */
  def decodeWav(p: Array[Byte]): Option[WavMeta] = {
    if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[Long] = None
    while (i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(p, i)
      val size = le32(p, i + 4)
      val body = i + 8
      if (id == "fmt " && size >= 16 && body + 16 <= p.length) {
        val audioFormat = le16(p, body)
        val channels = le16(p, body + 2)
        val rate = le32(p, body + 4)
        val bits = le16(p, body + 14)
        // PCM (1) or IEEE float (3); anything compressed is opaque
        if ((audioFormat == 1 || audioFormat == 3) && channels > 0 &&
          rate > 0 && rate <= Int.MaxValue && bits > 0 && bits % 8 == 0)
          fmt = Some((channels, rate.toInt, bits))
        else return None
      } else if (id == "data") {
        // the declared size, clamped to what the payload actually holds
        // (truncated tail uploads are common in crawls)
        data = Some(math.min(size, (p.length - body).toLong))
      }
      // chunks are word-aligned: odd sizes carry one pad byte. Advance
      // in LONG arithmetic — a corrupt/adversarial declared size near
      // 2^31 must end the walk (falling back to the opaque decoder),
      // never wrap the cursor negative and throw out of the task
      val next = body.toLong + size + (size & 1L)
      if (next > p.length.toLong) i = p.length else i = next.toInt
    }
    for ((ch, rate, bits) <- fmt; d <- data)
      yield WavMeta(ch, rate, bits, d)
  }
}
