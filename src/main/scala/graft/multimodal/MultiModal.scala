package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata.
  * At 100 TB the payload column dominates; everything here is designed
  * so metadata-only queries never deserialize payloads (parquet column
  * pruning drops `payload` unless a feature stage asks for it).
  */
case class MediaObject(
    doc_id: Long,
    media_type: String, // "image" | "audio" | "video" | "text"
    payload: Array[Byte])

/** Decoded per-object features. `format` says which decoder fired:
  * "ppm"/"wav" mean the header was REALLY parsed ([[HeaderCodec]] —
  * width/height resp. sample_rate/duration_ms are true metadata);
  * "opaque" means neither matched and dimensions fall back to the
  * deterministic [[MultiModal.StubCodec]] fake. Byte-level fields are
  * always real.
  */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    content_sha: String,
    n_frames: Int,
    width: Int,
    height: Int,
    format: String,
    sample_rate: Int,
    duration_ms: Long,
    byte_histogram: Array[Double])

/** One perceptual signature: the 64-bit aHash of a decoded raster as
  * EIGHT 8-bit bands (band i = signature bits [8i, 8i+8)) — the banded
  * layout IS the multi-index-hashing blocking key set (Norouzi et al.,
  * "Fast Search in Hamming Space with Multi-Index Hashing"): with 8
  * substring indexes, any pair within Hamming radius 7 shares at least
  * one band EXACTLY, by pigeonhole.
  */
case class PHashSig(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int,
    b4: Int, b5: Int, b6: Int, b7: Int)

/** Multimodal column plumbing: schema, partitioning and batch shape are
  * real Spark, and header-described formats (PPM images, WAV PCM
  * audio) decode for REAL via [[HeaderCodec]]. Compressed codecs
  * (JPEG/MP4/FLAC) would need media libraries this environment doesn't
  * ship — those payloads take the deterministic [[StubCodec]] fallback
  * so the plumbing stays exercised end to end.
  *
  * The decode stage runs as `mapPartitions` — the JVM analog of a
  * vectorized pandas-batch UDF: per-partition setup (digest instance,
  * codec context) is paid once, then rows stream through. Adding a
  * JNI/javacv codec for the compressed formats changes no plumbing:
  * it is one more branch ahead of the fallback.
  */
object MultiModal {

  val FrameBytes = 64

  /** The fallback decode seam for formats without a header parser.
    * Deterministic fake: dimensions are derived from the payload hash —
    * stable, schema-correct, test-friendly.
    */
  object StubCodec {
    def decodeDims(hash: Array[Byte]): (Int, Int) = {
      val w = 16 * (1 + ((hash(0) & 0x7f) % 120)) // 16..1920
      val h = 16 * (1 + ((hash(1) & 0x7f) % 68)) //  16..1088
      (w, h)
    }
  }

  /** documents.parquet rows → MediaObjects (text bytes stand in for
    * media payloads; the corpus has no real media).
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaObject] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        // deterministic fake modality from the id
        element_at(typedlit(Seq("image", "audio", "video", "text")),
          (col("doc_id") % 4 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaObject]
  }

  /** Object-store ingest: a directory of raw media files →
    * MediaObjects, via Spark's native `binaryFile` source (content +
    * path/length/mtime columns) — the layout a crawl actually lands in
    * (`s3://bucket/media/00017.jpg`). doc_id parses from the file
    * name, the modality from the extension; `pathGlobFilter` prunes at
    * LISTING time, so non-matching files are never opened — at 100 TB
    * the listing filter is the difference between touching the media
    * prefix and scanning it. Unknown extensions map to "binary" rather
    * than dropping rows; files WITHOUT a numeric id in the name are
    * skipped (try_cast, not an ANSI cast error on sidecar files).
    */
  def fromBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaObject] = {
    import spark.implicits._
    val ext = regexp_extract(col("path"), "\\.([a-zA-Z0-9]+)$", 1)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        expr("try_cast(regexp_extract(path, " +
          "'([0-9]+)\\\\.[a-zA-Z0-9]+$', 1) as bigint)").as("doc_id"),
        coalesce(element_at(typedlit(Map(
          "jpg" -> "image", "jpeg" -> "image", "png" -> "image",
          "wav" -> "audio", "flac" -> "audio",
          "mp4" -> "video", "webm" -> "video",
          "txt" -> "text")), lower(ext)), lit("binary")).as("media_type"),
        col("content").as("payload"))
      .filter(col("doc_id").isNotNull)
      .as[MediaObject]
  }

  /** Batch feature extraction over partitions. One shuffle-free pass:
    * Spark splits the scan, each task streams its rows through a
    * per-partition codec context.
    */
  def decodeFeatures(objects: Dataset[MediaObject]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    objects.mapPartitions { it =>
      val sha = MessageDigest.getInstance("SHA-256") // per-partition setup
      it.map { m =>
        sha.reset()
        val digest = sha.digest(m.payload)
        val hist = new Array[Double](8)
        var i = 0
        while (i < m.payload.length) {
          hist((m.payload(i) & 0xff) >> 5) += 1.0
          i += 1
        }
        val n = math.max(m.payload.length, 1)
        var b = 0
        while (b < 8) { hist(b) /= n; b += 1 }
        // real header decode first; stub dims only for opaque payloads
        val (fmt, w, h, rate, durMs) =
          HeaderCodec.decodePpm(m.payload) match {
            case Some(ppm) => ("ppm", ppm.width, ppm.height, 0, 0L)
            case None => HeaderCodec.decodeWav(m.payload) match {
              case Some(wav) =>
                ("wav", 0, 0, wav.sampleRate, wav.durationMs)
              case None =>
                val (sw, sh) = StubCodec.decodeDims(digest)
                ("opaque", sw, sh, 0, 0L)
            }
          }
        MediaFeatures(
          doc_id = m.doc_id,
          media_type = m.media_type,
          n_bytes = m.payload.length.toLong,
          content_sha = digest.map("%02x".format(_)).mkString,
          n_frames = (m.payload.length + FrameBytes - 1) / FrameBytes,
          width = w,
          height = h,
          format = fmt,
          sample_rate = rate,
          duration_ms = durMs,
          byte_histogram = hist)
      }
    }
  }

  /** Real P6 encoder for a grayscale pixel grid (r = g = b = v,
    * maxval 255): the write half of the codec roundtrip under the
    * perceptual-hash entries — the signature path exercises encode →
    * [[HeaderCodec.decodePpmGray]] on every row, so the hash provably
    * comes from decoded rasters, not payload bytes.
    */
  def encodePpmGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"pixel grid ${px.length} != $w x $h")
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < px.length) {
      val v = (px(i) & 0xff).toByte
      val b = header.length + 3 * i
      out(b) = v; out(b + 1) = v; out(b + 2) = v
      i += 1
    }
    out
  }

  /** 64-bit average-hash (aHash — the public-knowledge perceptual
    * fingerprint: grayscale → 8×8 box downsample → per-block
    * brighter-than-mean bit) over a decoded raster, folded as EIGHT
    * 8-bit bands — the multi-index-hashing substring layout (see
    * [[PHashSig]]) with no sign-bit care in either engine. All
    * integer: bit k = by*8 + bx is set iff blockSum(k) * 64 >
    * grandSum — multiply-through instead of dividing by the block
    * count, so the mean threshold is exact. Box blocks are w/8 × h/8
    * (dims must be multiples of 8), which makes the signature
    * INVARIANT under integer upscaling — the re-encode/resize
    * robustness byte-frame identity (p93) cannot have.
    */
  def aHashBands(gray: Array[Int], w: Int, h: Int): Array[Int] = {
    require(w % 8 == 0 && h % 8 == 0, s"dims $w x $h not multiples of 8")
    require(gray.length == w * h)
    val bw = w / 8
    val bh = h / 8
    val sums = new Array[Long](64)
    var y = 0
    while (y < h) {
      val rowBase = (y / bh) * 8
      var x = 0
      while (x < w) {
        sums(rowBase + x / bw) += gray(y * w + x)
        x += 1
      }
      y += 1
    }
    var grand = 0L
    var k = 0
    while (k < 64) { grand += sums(k); k += 1 }
    val bands = new Array[Int](8)
    k = 0
    while (k < 64) {
      if (sums(k) * 64 > grand) bands(k >> 3) |= 1 << (k & 7)
      k += 1
    }
    bands
  }

  /** Deterministic raster renderer for the perceptual-hash entries
    * (the corpus has no real media): pixel p of a side×side grayscale
    * grid is the 32-bit leading-md5 hash of `token[(p·T)/side²]:p`,
    * mod 256 — the same h32 the oracle replays
    * ([[graft.functions.HashScheme.h32Duck]]: first 4 digest bytes,
    * big-endian). JVM-direct with a reused digest instance: the
    * Catalyst HOF form (1024 interpreted lambda evals of
    * md5/conv/concat per doc) measured ~7 s at sf0.1 vs sub-second
    * here — the p06/p32 interpreted-HOF lesson.
    */
  def renderRaster(md: MessageDigest, toks: Seq[String], side: Int)
      : Array[Int] = {
    val nPix = side * side
    val t = toks.toArray
    val px = new Array[Int](nPix)
    var p = 0
    while (p < nPix) {
      val tok = t(((p.toLong * t.length) / nPix).toInt)
      md.reset()
      val d = md.digest((tok + ":" + p)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      px(p) = (h32 % 256).toInt
      p += 1
    }
    px
  }

  /** Perceptual signatures over the codec seam: each doc's token
    * array renders to a deterministic pixel grid ([[renderRaster]]),
    * is encoded as a REAL P6 payload, decoded back through
    * [[HeaderCodec.decodePpmGray]] (a structurally invalid roundtrip
    * throws — the codec is load-bearing, not decorative), and aHashed.
    * `scale` re-encodes at side×scale by pixel replication — the
    * resize-robustness probe: the signature is scale-invariant because
    * the 8×8 box blocks average the same pixels.
    *
    * mapPartitions by design — this is the binary-codec seam
    * (encode/decode over byte arrays, the one place relational
    * expressions can't reach); one shuffle-free pass, per-partition
    * codec context (digest instance), same shape as [[decodeFeatures]].
    */
  def perceptualSignatures(docs: Dataset[(Long, Seq[String])],
      side: Int = 32, scale: Int = 1): Dataset[PHashSig] = {
    implicit val enc = Encoders.product[PHashSig]
    docs.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition setup
      it.map { case (id, toks) =>
        val b = aHashSignature(md, id, toks, side, scale)
        PHashSig(id, b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7))
      }
    }
  }

  /** The per-document core of [[perceptualSignatures]] — render →
    * optional integer upscale → REAL P6 encode/decode roundtrip →
    * aHash bands — factored out so the streaming twin
    * ([[graft.streaming.StreamingPhashNearDup]]) computes the
    * IDENTICAL signature from the identical seam (one definition, no
    * drift between the batch entry and the online form).
    */
  def aHashSignature(md: MessageDigest, id: Long, toks: Seq[String],
      side: Int = 32, scale: Int = 1): Array[Int] = {
    require(toks.nonEmpty, s"doc $id: empty token array")
    val pix = renderRaster(md, toks, side)
    val w = side * scale
    val up =
      if (scale == 1) pix
      else {
        val u = new Array[Int](w * w)
        var y = 0
        while (y < w) {
          var x = 0
          while (x < w) {
            u(y * w + x) = pix((y / scale) * side + x / scale)
            x += 1
          }
          y += 1
        }
        u
      }
    val payload = encodePpmGray(w, w, up)
    val (meta, gray) = HeaderCodec.decodePpmGray(payload).getOrElse(
      throw new IllegalStateException(s"PPM roundtrip failed: doc $id"))
    aHashBands(gray, meta.width, meta.height)
  }

  /** Frame sampling: every k-th fixed-size frame of each payload — the
    * video-keyframe access pattern. Pure relational (posexplode over a
    * computed frame index sequence) so it stays in whole-stage codegen
    * and the payload is sliced, never re-decoded per frame.
    */
  def sampleFrames(objects: Dataset[MediaObject], everyK: Int): DataFrame =
    objects.toDF()
      .withColumn("n_frames",
        ceil(length(col("payload")) / lit(FrameBytes.toDouble)).cast("int"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, n_frames - 1, $everyK)")))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")
          .as("frame"))
}
