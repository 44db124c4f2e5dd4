package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{CodegenModes, SparkTestBase}

/** Codegen parity for the per-candidate kernels moved off
  * CodegenFallback in r11 (IntSqL2 / IntDot / IntEqCount /
  * ScaledL1Dist / Bm25Contrib): the generated path must equal the
  * interpreted path value-for-value, honor the length-mismatch → NULL
  * rule, and fail loudly on a NULL array element in BOTH modes.
  */
class KernelCodegenSpec extends AnyFunSuite with SparkTestBase with CodegenModes {

  test("int64 binary kernels: codegen == interpreted on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map { i =>
      (i.toLong,
        Array.fill(48)(rnd.nextInt(2000000) - 1000000L),
        Array.fill(48)(rnd.nextInt(2000000) - 1000000L))
    }.toDF("id", "a", "b")
    def run() = df.select(col("id"),
        SeriesKernelFunctions.int_sq_l2(col("a"), col("b")).as("l2"),
        SeriesKernelFunctions.int_dot(col("a"), col("b")).as("dot"),
        SeriesKernelFunctions.int_eq_count(col("a"), col("b")).as("eq"),
        SeriesKernelFunctions.scaled_l1_dist(col("a"), col("b"),
          (col("id") * 7L) - 400L, 48).as("l1"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val (gen, interp) = bothModes(run())
    assert(gen === interp)
    assert(gen.length === 300)
  }

  test("length mismatch yields NULL in both modes") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L, 3L), Seq(1L, 2L)))
      .toDF("id", "a", "b")
    def run() = df.select(
        SeriesKernelFunctions.int_sq_l2(col("a"), col("b")).as("l2"),
        SeriesKernelFunctions.int_dot(col("a"), col("b")).as("dot"),
        SeriesKernelFunctions.int_eq_count(col("a"), col("b")).as("eq"),
        SeriesKernelFunctions.scaled_l1_dist(col("a"), col("b"),
          lit(0L), 3).as("l1"))
      .collect().map(r => (0 until 4).map(r.isNullAt)).toSeq
    val (gen, interp) = bothModes(run())
    assert(gen === interp)
    assert(gen.head.forall(identity))
  }

  test("unary long kernels reject a formally-nullable array at " +
    "ANALYSIS time (promoted containsNull=false precondition)") {
    import spark.implicits._
    // Seq[java.lang.Long] gives the array a containsNull=true formal
    // type even though no element is null — misuse must fail before
    // execution, with the rebuild hint in the message
    val df = Seq((1L, Seq[java.lang.Long](5L, 6L, 7L))).toDF("id", "gs")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SeriesKernelFunctions.cusum_max_abs(col("gs")))
    }
    assert(e.getMessage.contains("non-nullable elements"), e.getMessage)
    // the same values under a non-null formal type evaluate fine
    val ok = Seq((1L, Seq(5L, 6L, 7L))).toDF("id", "gs")
      .select(SeriesKernelFunctions.cusum_max_abs(col("gs"))).collect()
    assert(!ok.head.isNullAt(0))
  }

  test("NULL array element fails loudly in both modes") {
    import spark.implicits._
    val df = Seq((1L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)))
      .toDF("id", "a", "b")
    def run(): String =
      try {
        df.select(SeriesKernelFunctions.int_dot(col("a"), col("b")))
          .collect(); "no-error"
      } catch {
        case e: Throwable =>
          val msgs = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).map(_.getMessage).mkString("; ")
          if (msgs.contains("NULL array element")) "kernel-error"
          else s"other-error: $msgs"
      }
    val (gen, interp) = bothModes(run())
    assert(gen === "kernel-error")
    assert(interp === "kernel-error")
  }

  test("robust_window_stats == the HOF chain it replaces, bit-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (1 to 300).map { i =>
      // include ties, negatives, ±0.0 (stable-order edge) and NaN
      // (Spark sorts it GREATEST; a plain-< comparator would leave it
      // in input position — the r11 review catch)
      (i.toLong, Array.fill(25)(rnd.nextInt(12) match {
        case 0 => 0.0
        case 1 => -0.0
        case 2 => Double.NaN
        case k => (rnd.nextDouble() - 0.5) * k
      }))
    }.toDF("id", "arr")
    val rows = df.select(col("id"), col("arr"),
        SeriesKernelFunctions.robust_window_stats(col("arr"), 13, 7, 19)
          .as("rs"),
        array_sort(col("arr")).as("sarr"))
      .withColumn("med", expr("element_at(sarr, 13)"))
      .withColumn("mad", expr(
        "element_at(array_sort(transform(arr, x -> abs(x - med))), 13)"))
      .select(col("rs"), col("med"), col("mad"),
        expr("element_at(sarr, 7)").as("q1"),
        expr("element_at(sarr, 19)").as("q3"))
      .collect()
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    assert(rows.length === 300)
    rows.foreach { r =>
      val rs = r.getStruct(0)
      assert(bits(rs.getDouble(0)) === bits(r.getDouble(1)), "med")
      assert(bits(rs.getDouble(1)) === bits(r.getDouble(2)), "mad")
      assert(bits(rs.getDouble(2)) === bits(r.getDouble(3)), "q1")
      assert(bits(rs.getDouble(3)) === bits(r.getDouble(4)), "q3")
    }
    // short windows yield NULL, matching element_at's out-of-bounds null
    val short = Seq((1L, Array(1.0, 2.0))).toDF("id", "arr")
      .select(SeriesKernelFunctions.robust_window_stats(col("arr"), 13, 7, 19))
      .collect()
    assert(short.head.isNullAt(0))
  }

  test("robust_window_stats needMad=false: NULL (nullable) mad slot") {
    import spark.implicits._
    val df = Seq((1L, Array(3.0, 1.0, 2.0))).toDF("id", "arr")
      .select(SeriesKernelFunctions
        .robust_window_stats(col("arr"), 2, 1, 3, needMad = false).as("rs"))
    val madField = df.schema("rs").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("mad")
    assert(madField.nullable, "unread slot must be declared nullable")
    val rs = df.collect().head.getStruct(0)
    assert(rs.getDouble(0) === 2.0)
    assert(rs.isNullAt(1), "unread slot must be NULL, not NaN")
    assert(rs.getDouble(2) === 1.0 && rs.getDouble(3) === 3.0)
    // the default (needMad = true) keeps the non-null contract
    val full = Seq((1L, Array(3.0, 1.0, 2.0))).toDF("id", "arr")
      .select(SeriesKernelFunctions
        .robust_window_stats(col("arr"), 2, 1, 3).as("rs"))
    assert(!full.schema("rs").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("mad").nullable)
    assert(full.collect().head.getStruct(0).getDouble(1) === 1.0)
  }

  test("winnow_fingerprints == the interpreted transform/slice/min chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // small hash domain -> frequent repeated grams (distinct-dedup and
    // rightmost-tie-break paths both exercised); include short streams
    val df = (1 to 300).map { i =>
      val m = rnd.nextInt(40) // 0..39, below w=4 sometimes
      (i.toLong, Array.fill(m)(rnd.nextInt(50).toLong))
    }.toDF("id", "gs")
    val rows = df.select(col("id"),
        SeriesKernelFunctions.winnow_fingerprints(col("gs"), 4).as("k"),
        expr("""array_distinct(flatten(transform(
              array(flatten(transform(
                array(gs),
                gs -> transform(sequence(1, greatest(size(gs)-3, 1)), i ->
                  array_min(transform(slice(gs, i, 4), (g, o) ->
                    g*4 + 3 - o)))))),
              ks -> transform(ks, (k, i0) ->
                named_struct(
                  'pos', cast(i0 + 4 - (k % 4) as bigint),
                  'fp', k div 4)))))""").as("l"),
        size(col("gs")).as("m"))
      .collect()
    assert(rows.length === 300)
    var nonEmpty = 0
    rows.foreach { r =>
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1)))
      if (r.getInt(3) >= 4) {
        val exp = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(got === exp, s"id=${r.getLong(0)}")
        if (got.nonEmpty) nonEmpty += 1
      } else {
        // the old clamped form emits junk on short rows (filtered
        // upstream in p36); the kernel is total: empty selection
        assert(got.isEmpty, s"id=${r.getLong(0)}")
      }
    }
    assert(nonEmpty > 50, "generator produced too few real streams")
  }

  test("winnow_fingerprints rejects out-of-domain w and negative grams") {
    import spark.implicits._
    // w > 8 overflows the 60-bit tie-break encoding: construction fails
    val one = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    val big = intercept[IllegalArgumentException] {
      graft.functions.WinnowFingerprints(one, 9)
    }
    assert(big.getMessage.contains("overflow"))
    assert(intercept[IllegalArgumentException] {
      graft.functions.WinnowFingerprints(one, 1)
    }.getMessage.contains("at least 2"))
    // an out-of-domain gram would corrupt the k%w position decode
    // (negative, or so large that gram*w wraps int64): loud failure
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("out of domain")) ||
        mentions(t.getCause))
    val neg = intercept[Exception] {
      Seq((1L, Array(3L, -1L, 5L, 7L, 9L))).toDF("id", "gs")
        .select(SeriesKernelFunctions.winnow_fingerprints(col("gs"), 4))
        .collect()
    }
    assert(mentions(neg), s"unexpected failure: $neg")
    val huge = intercept[Exception] {
      Seq((1L, Array(3L, Long.MaxValue / 2, 5L, 7L, 9L))).toDF("id", "gs")
        .select(SeriesKernelFunctions.winnow_fingerprints(col("gs"), 4))
        .collect()
    }
    assert(mentions(huge), s"unexpected failure: $huge")
    // the 60-bit design domain itself stays accepted
    val ok = Seq((1L, Array.tabulate(6)(i => (1L << 60) - 1 - i)))
      .toDF("id", "gs")
      .select(SeriesKernelFunctions.winnow_fingerprints(col("gs"), 4))
      .collect()
    assert(!ok.head.isNullAt(0))
  }

  test("cusum_max_abs == the interpreted prefix-fold pipeline it replaces") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val w = 20
    val df = (1 to 200).map { i =>
      (i.toLong, Array.fill(w)(rnd.nextInt(2000001) - 1000000L))
    }.toDF("id", "arr")
    val rows = df.select(col("id"),
        SeriesKernelFunctions.cusum_max_abs(col("arr")).as("k"),
        expr(s"""array_max(transform(sequence(1, ${w - 1}), j ->
          abs($w * aggregate(slice(arr, 1, j), 0L, (acc, x) -> acc + x)
            - j * aggregate(arr, 0L, (acc, x) -> acc + x))))""").as("l"))
      .collect()
    assert(rows.length === 200)
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2)))
    // short windows are NULL
    val short = Seq((1L, Array(5L))).toDF("id", "arr")
      .select(SeriesKernelFunctions.cusum_max_abs(col("arr"))).collect()
    assert(short.head.isNullAt(0))
  }

  test("bm25_contrib: a negative BEFORE a NULL throws in both modes; " +
    "a NULL BEFORE a negative returns NULL in both modes") {
    import spark.implicits._
    def run(idf6: java.lang.Long, n: java.lang.Long): String =
      try {
        val r = Seq((idf6, n)).toDF("idf6", "n")
          .select(SeriesKernelFunctions.bm25_contrib(col("idf6"), lit(1L),
            lit(1L), lit(1L), col("n")))
          .collect().head
        if (r.isNullAt(0)) "null" else s"value=${r.getLong(0)}"
      } catch {
        case e: Throwable =>
          val msgs = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).map(_.getMessage).mkString("; ")
          if (msgs.contains("negative input")) "neg-error"
          else s"other-error: $msgs"
      }
    // negative at arg 0, NULL at arg 4 -> the arg-order guard throws
    val (g1, i1) = bothModes(run(-5L, null))
    assert(g1 === "neg-error" && i1 === "neg-error")
    // NULL at arg 0, negative at arg 4 -> NULL wins (later args unchecked)
    val (g2, i2) = bothModes(run(null, -5L))
    assert(g2 === "null" && i2 === "null")
  }

  test("bm25_contrib: codegen == interpreted across the operand domain") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map { i =>
      (i.toLong,
        1L + rnd.nextInt(20000000).toLong,      // idf6
        1L + rnd.nextInt(500).toLong,           // tf
        1L + rnd.nextInt(5000).toLong,          // dl
        1L + math.abs(rnd.nextLong() % 10000000000000L), // A ~ 1e13
        1L + rnd.nextInt(100000000).toLong)     // nDocs
    }
    val df = rows.toDF("id", "idf6", "tf", "dl", "a", "n")
    def run() = df.select(col("id"),
        SeriesKernelFunctions.bm25_contrib(col("idf6"), col("tf"),
          col("dl"), col("a"), col("n")).as("c6"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (gen, interp) = bothModes(run())
    assert(gen === interp)
    // spot-check one value against the sequential reference impl
    val (_, idf6, tf, dl, a, n) = rows.head
    assert(gen.head._2 === Bm25Contrib.c6(idf6, tf, dl, a, n))
  }
}
