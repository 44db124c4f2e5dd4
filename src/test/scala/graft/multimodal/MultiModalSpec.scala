package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultiModalSpec extends AnyFunSuite with SparkTestBase {

  test("decodeFeatures: deterministic, schema-correct, payload-derived") {
    val objs = MultiModal.fromDocuments(spark, sfDir)
    val f1 = MultiModal.decodeFeatures(objs).collect().sortBy(_.doc_id)
    val f2 = MultiModal.decodeFeatures(objs).collect().sortBy(_.doc_id)
    assert(f1.length === 500)
    assert(f1.map(_.content_sha).toSeq === f2.map(_.content_sha).toSeq)
    f1.take(50).foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.content_sha.length === 64)
      assert(f.n_frames === ((f.n_bytes + MultiModal.FrameBytes - 1)
        / MultiModal.FrameBytes).toInt)
      // text payloads are no real media format -> stub dims fallback
      assert(f.format === "opaque")
      assert(f.width >= 16 && f.width <= 1920)
      assert(f.height >= 16 && f.height <= 1088)
      assert(math.abs(f.byte_histogram.sum - 1.0) < 1e-9)
    }
  }

  /** A structurally valid binary PPM: header with a comment, then a
    * full RGB raster.
    */
  private def ppmBytes(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# synthetic test image\n$w $h\n255\n"
      .getBytes("US-ASCII")
    val raster = Array.tabulate(w * h * 3)(i => (i % 251).toByte)
    header ++ raster
  }

  /** A structurally valid 16-bit PCM WAV with `nSamples` samples. */
  private def wavBytes(rate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nSamples * channels).foreach(i => bb.putShort((i % 1000).toShort))
    bb.array()
  }

  test("HeaderCodec: real PPM and WAV headers decode to true metadata; " +
    "malformed payloads fall back") {
    // direct kernel checks
    val ppm = HeaderCodec.decodePpm(ppmBytes(320, 200))
    assert(ppm === Some(HeaderCodec.PpmMeta(320, 200, 255)))
    // truncated raster is NOT a valid image
    assert(HeaderCodec.decodePpm(ppmBytes(320, 200).dropRight(1)).isEmpty)
    assert(HeaderCodec.decodePpm("P6 garbage".getBytes("US-ASCII")).isEmpty)
    val wav = HeaderCodec.decodeWav(wavBytes(44100, 2, 44100)).get
    assert(wav.sampleRate === 44100 && wav.channels === 2 &&
      wav.bitsPerSample === 16)
    assert(wav.durationMs === 1000L) // 44100 samples at 44.1kHz = 1s
    assert(HeaderCodec.decodeWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // adversarial chunk size near 2^31 must END the walk (opaque
    // fallback), never wrap the cursor negative and throw (review
    // finding: Int overflow in the chunk advance)
    val evil = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")).putInt(2147483636)
      bb.array()
    }
    assert(HeaderCodec.decodeWav(evil).isEmpty)
    // through the Spark decode stage: real formats report real
    // metadata, everything else takes the stub fallback
    import spark.implicits._
    val objs = Seq(
      MediaObject(1L, "image", ppmBytes(64, 48)),
      MediaObject(2L, "audio", wavBytes(8000, 1, 4000)),
      MediaObject(3L, "text", "just some text".getBytes("UTF-8"))).toDS()
    val f = MultiModal.decodeFeatures(objs).collect()
      .map(x => x.doc_id -> x).toMap
    assert(f(1L).format === "ppm")
    assert((f(1L).width, f(1L).height) === ((64, 48)))
    assert(f(2L).format === "wav")
    assert(f(2L).sample_rate === 8000)
    assert(f(2L).duration_ms === 500L)
    assert((f(2L).width, f(2L).height) === ((0, 0)))
    assert(f(3L).format === "opaque")
    assert(f(3L).width >= 16)
  }

  test("bootstrap conf rejects windows beyond the PermDraw position " +
    "bound at CONFIG time, not per-row (review finding)") {
    import graft.kernel.{AnomalyzerConf, PermDraw}
    val big = AnomalyzerConf(activeSize = PermDraw.MaxPositions / 4 + 1,
      nSeasons = 4, methods = Seq("diff"))
    assert(AnomalyzerConf.validate(big).isLeft)
    // deterministic-only methods are not bounded by the draw
    assert(AnomalyzerConf.validate(big.copy(
      methods = Seq("magnitude"))).isRight)
  }

  test("fromBinaryFiles -> decodeFeatures: a real .ppm/.wav on disk " +
    "round-trips through the object-store ingest with true metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    try {
      java.nio.file.Files.write(dir.resolve("00007.png"), ppmBytes(128, 96))
      java.nio.file.Files.write(dir.resolve("00008.wav"),
        wavBytes(16000, 1, 8000))
      val f = MultiModal.decodeFeatures(
        MultiModal.fromBinaryFiles(spark, dir.toString)).collect()
        .map(x => x.doc_id -> x).toMap
      assert(f(7L).format === "ppm" && f(7L).width === 128 &&
        f(7L).height === 96)
      assert(f(8L).format === "wav" && f(8L).sample_rate === 16000 &&
        f(8L).duration_ms === 500L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("sampleFrames: every k-th 64-byte frame, last frame may be short") {
    val objs = MultiModal.fromDocuments(spark, sfDir)
    val frames = MultiModal.sampleFrames(objs, everyK = 4)
    val perDoc = frames.groupBy("doc_id").count()
      .join(MultiModal.decodeFeatures(objs).toDF
        .select(col("doc_id"), col("n_frames")), "doc_id")
      .collect()
    perDoc.foreach { r =>
      val expected = (r.getAs[Int]("n_frames") + 3) / 4
      assert(r.getAs[Long]("count") === expected)
    }
    val sizes = frames.select(length(col("frame")).as("len")).collect()
    assert(sizes.forall(_.getInt(0) <= MultiModal.FrameBytes))
    assert(sizes.count(_.getInt(0) === MultiModal.FrameBytes) > 0)
  }

  test("fromBinaryFiles: object-store ingest parses ids and " +
    "modalities, glob prunes at listing time, features match the " +
    "parquet-ingested path byte for byte") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    try {
      val payloads = Map(
        "00017.jpg" -> "fake jpeg bytes",
        "00042.wav" -> "fake audio payload, longer than the image",
        "00099.mp4" -> "tiny",
        "00123.txt" -> "plain text payload",
        "00200.xyz" -> "unknown modality bytes",
        "notes.json" -> "{\"skip\": true}")
      payloads.foreach { case (name, body) =>
        java.nio.file.Files.write(dir.resolve(name),
          body.getBytes("UTF-8"))
      }
      val all = MultiModal.fromBinaryFiles(spark, dir.toString).collect()
        .map(m => m.doc_id -> m).toMap
      // notes.json has no numeric id in its name -> skipped by ingest
      assert(all.keySet === Set(17L, 42L, 99L, 123L, 200L),
        s"ids parsed: ${all.keySet}")
      assert(all(17L).media_type === "image")
      assert(all(42L).media_type === "audio")
      assert(all(99L).media_type === "video")
      assert(all(123L).media_type === "text")
      assert(all(200L).media_type === "binary")
      assert(new String(all(42L).payload, "UTF-8") ===
        payloads("00042.wav"))
      // listing-time pruning: the glob never opens non-matching files
      val onlyJpg =
        MultiModal.fromBinaryFiles(spark, dir.toString, "*.jpg").collect()
      assert(onlyJpg.map(_.doc_id).toSeq === Seq(17L))
      // features parity with the parquet-ingested path: same payload ->
      // same MediaFeatures, regardless of which source produced it
      import spark.implicits._
      val viaFiles = MultiModal.decodeFeatures(
        MultiModal.fromBinaryFiles(spark, dir.toString, "*.wav"))
        .collect().head
      val direct = MultiModal.decodeFeatures(
        Seq(MediaObject(42L, "audio",
          payloads("00042.wav").getBytes("UTF-8"))).toDS()).collect().head
      assert(viaFiles.content_sha === direct.content_sha)
      assert(viaFiles.n_bytes === direct.n_bytes)
      assert(viaFiles.byte_histogram.toSeq === direct.byte_histogram.toSeq)
      assert((viaFiles.width, viaFiles.height) ===
        ((direct.width, direct.height)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("perceptual aHash: the P6 roundtrip is pixel-exact, gray decode " +
    "matches the encoder's values, and the signature is a real " +
    "function of the raster") {
    val rnd = new scala.util.Random(42)
    val px = Array.fill(32 * 32)(rnd.nextInt(256))
    val payload = MultiModal.encodePpmGray(32, 32, px)
    val decoded = HeaderCodec.decodePpmGray(payload)
    assert(decoded.isDefined, "roundtrip must decode")
    val (meta, gray) = decoded.get
    assert((meta.width, meta.height, meta.maxval) === ((32, 32, 255)))
    assert(gray.toSeq === px.toSeq, "decode(encode(px)) must be identity")
    val b = MultiModal.aHashBands(gray, 32, 32)
    assert(b.length === 8)
    assert(b.forall(v => v >= 0 && v <= 255), "8-bit bands")
    // exactly the blockSum*64 > grandSum rule, recomputed independently
    val sums = Array.tabulate(64) { k =>
      val (by, bx) = (k / 8, k % 8)
      (0 until 4).flatMap(dy => (0 until 4).map(dx =>
        px((by * 4 + dy) * 32 + (bx * 4 + dx)).toLong)).sum
    }
    val grand = sums.sum
    val expect = Array.tabulate(8)(bi => (0 until 8).map { bit =>
      if (sums(bi * 8 + bit) * 64 > grand) 1 << bit else 0 }.sum)
    assert(b.toSeq === expect.toSeq)
  }

  test("perceptual aHash: invariant under 2x/4x integer upscale " +
    "re-encode (the resize robustness p93's byte-frame identity " +
    "cannot have), while the payload bytes fully diverge") {
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "split(lower(regexp_replace(trim(text), '\\\\s+', ' ')), ' ') tk")
      .where("size(tk) > 0").limit(40)
      .as[(Long, Seq[String])]
    val s1 = MultiModal.perceptualSignatures(docs, scale = 1)
      .collect().sortBy(_.doc_id)
    val s2 = MultiModal.perceptualSignatures(docs, scale = 2)
      .collect().sortBy(_.doc_id)
    val s4 = MultiModal.perceptualSignatures(docs, scale = 4)
      .collect().sortBy(_.doc_id)
    assert(s1.length === 40)
    assert(s1.toSeq === s2.toSeq)
    assert(s1.toSeq === s4.toSeq)
    // and the payloads byte-frame dedup would compare share NOTHING:
    // a 64x64 re-encode has 4x the raster bytes of the 32x32 original
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = docs.collect().head._2
    val px = MultiModal.renderRaster(md, toks, 32)
    val up = {
      val u = new Array[Int](64 * 64)
      for (y <- 0 until 64; x <- 0 until 64)
        u(y * 64 + x) = px((y / 2) * 32 + x / 2)
      u
    }
    assert(MultiModal.encodePpmGray(32, 32, px).length !=
      MultiModal.encodePpmGray(64, 64, up).length)
  }

  test("renderRaster matches the oracle's h32 arithmetic " +
    "(md5 leading 4 bytes, big-endian, mod 256) token-for-token") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = Seq("alpha", "beta", "gamma")
    val px = MultiModal.renderRaster(md, toks, 32)
    assert(px.length === 1024)
    // independent recomputation through the hex route h32Spark/h32Duck
    // use: first 8 hex chars of md5 as a base-16 integer
    def hex32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    for (p <- Seq(0, 1, 511, 1023)) {
      val tok = toks(((p.toLong * toks.length) / 1024).toInt)
      assert(px(p) === (hex32(s"$tok:$p") % 256).toInt, s"pixel $p")
    }
  }
}
