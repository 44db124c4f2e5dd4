package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property pin for the a36 ESD fold: 200 seeded random windows —
  * including duplicate-heavy ones that force deviation ties and a few
  * constant ones — evaluated through the actual esdFoldSql expression
  * in one DataFrame pass, compared bit-for-bit against EsdSpec's
  * sequential reference semantics re-implemented here.
  */
class EsdProps extends AnyFunSuite with SparkTestBase {

  private val w = Anomaly.EsdWindow
  private val k = Anomaly.EsdRounds

  private def esdRef(win0: Array[Long]): (Seq[Double], Boolean) =
    EsdTestRef.esdRef(win0, w, k)

  test("fold == sequential reference on 200 random windows " +
    "(duplicates, ties, constants)") {
    val rnd = new java.util.SplittableRandom(0xE5D0L)
    val windows: Seq[Array[Long]] = (0 until 200).map { i =>
      if (i % 50 == 49) Array.fill(w)(rnd.nextLong(1000L)) // high-entropy
      else if (i % 25 == 24) Array.fill(w)(7L) // constant
      else Array.fill(w)(rnd.nextLong(5L)) // tiny alphabet -> many ties
    }
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val base = windows.zipWithIndex
      .map { case (arr, id) => (id, arr) }.toDF("id", "arr0")
      .withColumn("sx0", expr("aggregate(arr0, 0L, (a, x) -> a + x)"))
      .withColumn("sxx0", expr(
        "aggregate(arr0, cast(0 as decimal(38,0)), " +
          "(a, x) -> a + cast(x as decimal(38,0)) * x)"))
    // three-way pin: the production NATIVE expression (EsdRounds), the
    // SQL-expressible fold it replaced (esdFoldSql, kept as reference),
    // and the sequential Scala reference must all agree bit-for-bit
    def collectEsd(esd: org.apache.spark.sql.Column)
        : Map[Int, (Seq[Double], Boolean)] =
      base.withColumn("esd", esd)
        .select(col("id"), col("esd.r1"), col("esd.r2"), col("esd.r3"),
          col("esd.vnz"))
        .collect().map { r =>
          r.getInt(0) -> ((Seq(1, 2, 3).map(i =>
            if (r.isNullAt(i)) Double.NaN else r.getDouble(i)),
            r.getBoolean(4)))
        }.toMap
    val gotNative = collectEsd(graft.functions.EsdFunctions.esd_rounds(
      col("arr0"), col("sx0"), col("sxx0"), w, k))
    val gotFold =
      collectEsd(expr(Anomaly.esdFoldSql(w, k, "arr0", "sx0", "sxx0")))
    windows.zipWithIndex.foreach { case (arr, id) =>
      val (rs, ok) = esdRef(arr)
      for ((tag, got) <- Seq("native" -> gotNative, "fold" -> gotFold)) {
        val (gotRs, gotOk) = got(id)
        assert(gotOk === ok, s"window $id vnz [$tag]")
        rs.zip(gotRs).zipWithIndex.foreach { case ((e, g), j) =>
          // compare every round whose reference value is defined —
          // including non-degenerate rounds of a window whose LATER
          // round went constant (only the degenerate round itself
          // emits NULL/NaN by design)
          if (!e.isNaN)
            assert(java.lang.Double.compare(e, g) === 0,
              s"window $id round ${j + 1} [$tag]: expected $e got $g")
          else
            assert(g.isNaN,
              s"window $id round ${j + 1} [$tag]: degenerate round " +
                s"must be NULL, got $g")
        }
      }
    }
  }
}
