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
      assert(f.width >= 16 && f.width <= 1920)
      assert(f.height >= 16 && f.height <= 1088)
      assert(math.abs(f.byte_histogram.sum - 1.0) < 1e-9)
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
}
