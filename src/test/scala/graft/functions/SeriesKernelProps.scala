package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the r11 kernels against independent
  * sequential references — randomized inputs (duplicates, negatives,
  * ±0.0, extreme magnitudes) exercise paths the seeded DataFrame
  * parity specs cannot enumerate. Interpreted eval is tested directly
  * (ArrayData in, value out); codegen == interpreted is pinned
  * separately in KernelCodegenSpec.
  */
object SeriesKernelProps extends Properties("functions.SeriesKernels") {

  private def arr(xs: Seq[Long]): InternalRow =
    new GenericInternalRow(Array[Any](ArrayData.toArrayData(xs.toArray)))
  private def darr(xs: Seq[Double]): InternalRow =
    new GenericInternalRow(Array[Any](ArrayData.toArrayData(xs.toArray)))
  private val longArr =
    BoundReference(0, ArrayType(LongType, containsNull = false), true)
  private val dblArr =
    BoundReference(0, ArrayType(DoubleType, containsNull = false), true)

  // ---- CusumMaxAbs vs a direct BigInt reference (overflow-free)
  private val cusumIn: Gen[List[Long]] =
    Gen.chooseNum(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000000000000000L, 1000000000000000L)))

  property("cusum_max_abs == BigInt reference") = forAll(cusumIn) { xs =>
    val got = CusumMaxAbs(longArr).eval(arr(xs)).asInstanceOf[Long]
    val n = xs.length
    val sn = xs.map(BigInt(_)).sum
    val exp = (1 until n).map { j =>
      (BigInt(n) * xs.take(j).map(BigInt(_)).sum - BigInt(j) * sn).abs
    }.max
    BigInt(got) == exp
  }

  property("cusum_max_abs: windows shorter than 2 are NULL") =
    forAll(Gen.oneOf(Seq.empty[Long], Seq(7L))) { xs =>
      CusumMaxAbs(longArr).eval(arr(xs)) == null
    }

  // ---- WinnowFingerprints' primitive last-w dedup vs the boxed
  // global LinkedHashSet reference it replaced (r12): a tiny hash
  // domain forces dense repeats and long min-runs — the exact shapes
  // where a wrong dedup window would diverge from global first-
  // occurrence distinct
  private val winnowIn: Gen[(Int, List[Long])] = for {
    w <- Gen.chooseNum(2, 8)
    n <- Gen.chooseNum(0, 60)
    xs <- Gen.listOfN(n, Gen.chooseNum(0L, 12L))
  } yield (w, xs)

  property("winnow_fingerprints == global LinkedHashSet reference") =
    forAll(winnowIn) { case (w, gs) =>
      val got = WinnowFingerprints(longArr, w).eval(arr(gs))
        .asInstanceOf[ArrayData]
      val gotPairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        (r.getLong(0), r.getLong(1))
      }
      val ref = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
      var i = 1
      while (i <= gs.length - w + 1) {
        var k = Long.MaxValue
        var o = 0
        while (o < w) {
          val cand = gs(i - 1 + o) * w + (w - 1 - o)
          if (cand < k) k = cand
          o += 1
        }
        ref += (((i + (w - 1) - (k % w)), k / w))
        i += 1
      }
      gotPairs == ref.toSeq
    }

  // ---- RobustWindowStats vs a boxed stable-sort reference with
  // array_sort's comparator semantics (±0.0 equal, input order kept)
  private val robustIn: Gen[List[Double]] =
    Gen.chooseNum(13, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.oneOf(0.0, -0.0, 1.0, -1.0, 0.5, Double.NaN))))

  private def sortRef(xs: Seq[Double]): IndexedSeq[Double] = {
    // stable sort under Spark SQL double ordering: ±0.0 equal (input
    // order kept), NaN greater than everything and equal to itself
    xs.zipWithIndex.sortWith { case ((a, ia), (b, ib)) =>
      if (a < b) true
      else if (a > b) false
      else {
        val na = a.isNaN; val nb = b.isNaN
        if (na != nb) nb else ia < ib
      }
    }.map(_._1).toIndexedSeq
  }

  property("robust_window_stats == stable-sort reference (bit-exact)") =
    forAll(robustIn) { xs =>
      val mid = 13
      val got = RobustWindowStats(dblArr, mid, 7, 13).eval(darr(xs))
        .asInstanceOf[InternalRow]
      val sorted = sortRef(xs)
      val med = sorted(mid - 1)
      val mad = sortRef(xs.map(x => math.abs(x - med)))(mid - 1)
      def b(d: Double) = java.lang.Double.doubleToRawLongBits(d)
      b(got.getDouble(0)) == b(med) && b(got.getDouble(1)) == b(mad) &&
        b(got.getDouble(2)) == b(sorted(6)) &&
        b(got.getDouble(3)) == b(sorted(12))
    }

  property("robust_window_stats: needMad=false matches med/q1/q3 and " +
    "NULLs the mad slot") = forAll(robustIn) { xs =>
    val full = RobustWindowStats(dblArr, 13, 7, 13).eval(darr(xs))
      .asInstanceOf[InternalRow]
    val slim = RobustWindowStats(dblArr, 13, 7, 13, needMad = false)
      .eval(darr(xs)).asInstanceOf[InternalRow]
    def b(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    b(slim.getDouble(0)) == b(full.getDouble(0)) &&
      slim.isNullAt(1) &&
      b(slim.getDouble(2)) == b(full.getDouble(2)) &&
      b(slim.getDouble(3)) == b(full.getDouble(3))
  }

  property("robust_window_stats: short windows are NULL") =
    forAll(Gen.listOfN(5, Gen.chooseNum(-10.0, 10.0))) { xs =>
      RobustWindowStats(dblArr, 13, 7, 19).eval(darr(xs)) == null
    }

  // ---- Bm25Contrib.c6 vs a BigInt reference across the full declared
  // domain (A up to corpus token counts at the 100 TB design point)
  private val bm25In: Gen[(Long, Long, Long, Long, Long)] = for {
    idf6 <- Gen.chooseNum(1L, 25000000L)
    tf <- Gen.chooseNum(1L, 10000L)
    dl <- Gen.chooseNum(1L, 100000L)
    a <- Gen.chooseNum(1L, 20000000000000L)
    n <- Gen.chooseNum(1L, 10000000000L)
  } yield (idf6, tf, dl, a, n)

  property("bm25_contrib c6 == BigInt reference") = forAll(bm25In) {
    case (idf6, tf, dl, a, n) =>
      val num = BigInt(idf6) * 22 * tf * a
      val den = BigInt(10) * tf * a + BigInt(3) * a + BigInt(9) * dl * n
      val exp = (num + den / 2) / den
      BigInt(Bm25Contrib.c6(idf6, tf, dl, a, n)) == exp
  }
}
