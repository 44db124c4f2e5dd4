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
}
