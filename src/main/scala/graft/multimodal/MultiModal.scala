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
