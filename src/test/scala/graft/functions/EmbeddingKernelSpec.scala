package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{CodegenModes, SparkTestBase}

/** CosineSim / DoubleDot kernel contract: the generated-code path is
  * bit-identical to the interpreted path (the r11 doGenCode move off
  * CodegenFallback must not change a single ulp), the NULL contract
  * (length mismatch, NULL element) holds in both modes, and the p06
  * norm-precompute form dot/(na·nb) reproduces CosineSim exactly.
  */
class EmbeddingKernelSpec extends AnyFunSuite with SparkTestBase with CodegenModes {

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 200).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("cosine_sim and double_dot: codegen == interpreted, bit-exact") {
    val df = vecs
    def run() = df.select(
        VectorOps.cosine(col("a"), col("b")).as("cos"),
        VectorOps.dotNative(col("a"), col("b")).as("dot"))
      .collect()
      .map(r => (java.lang.Double.doubleToRawLongBits(r.getDouble(0)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
      .toSeq
    val (gen, interp) = bothModes(run())
    assert(gen === interp)
    assert(gen.nonEmpty)
  }

  test("norm-precompute form dot/(na*nb) is bit-identical to cosine_sim") {
    val df = vecs
      .withColumn("na", sqrt(VectorOps.dot(col("a"), col("a"))))
      .withColumn("nb", sqrt(VectorOps.dot(col("b"), col("b"))))
    val rows = df.select(
        VectorOps.cosine(col("a"), col("b")).as("full"),
        (VectorOps.dotNative(col("a"), col("b")) /
          (col("na") * col("nb"))).as("pre"))
      .collect()
    assert(rows.length === 200)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("NULL contract: length mismatch and NULL element, both modes") {
    import spark.implicits._
    def run() = {
      val df = Seq(
        (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
        (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
        (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
        (4L, Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](0.0, 0.0)))
        .toDF("id", "a", "b")
      df.select(col("id"), VectorOps.cosine(col("a"), col("b")).as("cos"),
          VectorOps.dotNative(col("a"), col("b")).as("dot"))
        .orderBy("id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None
          else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1))),
          if (r.isNullAt(2)) None
          else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(2)))))
        .toSeq
    }
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    val (gen, interp) = bothModes(run())
    assert(gen === interp)
    assert(gen(0)._2 === None && gen(0)._3 === None) // length mismatch
    assert(gen(1)._2 === None && gen(1)._3 === None) // NULL element
    assert(gen(2)._2 ===
      Some(bits(11.0 / (math.sqrt(5.0) * math.sqrt(25.0)))))
    assert(gen(2)._3 === Some(bits(11.0)))
    // zero vector: 0/0 = NaN like the zip_with form
    assert(gen(3)._2.exists(b =>
      java.lang.Double.longBitsToDouble(b).isNaN))
  }
}
