package graft.kernel

import java.util.SplittableRandom

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the vector kernel, checked against
  * brute-force O(n²) reference implementations over randomized inputs
  * (including deliberate ties, which the example-based specs can only
  * sample). Complements VecSpec's pinned examples.
  */
object VecProps extends Properties("kernel.Vec") {

  // mix continuous values with a small discrete set so ties are common
  private val element: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-100.0, 100.0),
    Gen.choose(-3, 3).map(_.toDouble))

  private val vec: Gen[Array[Double]] =
    Gen.nonEmptyListOf(element).map(_.toArray)

  property("rank == count of strictly smaller elements") =
    forAll(vec) { xs =>
      val expected = xs.map(x => xs.count(_ < x).toDouble)
      Vec.rank(xs).sameElements(expected)
    }

  property("equal values get equal (min-tie) ranks") =
    forAll(vec) { xs =>
      val r = Vec.rank(xs)
      Prop.forAll(Gen.choose(0, xs.length - 1),
        Gen.choose(0, xs.length - 1)) { (i, j) =>
        xs(i) != xs(j) || r(i) == r(j)
      }
    }

  property("ecdf(q) == #{x <= q} / n, at elements and arbitrary points") =
    forAll(vec, element) { (xs, q) =>
      val f = Vec.ecdf(xs)
      val n = xs.length.toDouble
      val atQ = f(q) == xs.count(_ <= q) / n
      val atElems = xs.forall(x => f(x) == xs.count(_ <= x) / n)
      atQ && atElems
    }

  property("ecdf is monotone") = forAll(vec, element, element) {
    (xs, a, b) =>
      val f = Vec.ecdf(xs)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      f(lo) <= f(hi)
  }

  property("diff/relDiff have length n-1; diff of constant is zero") =
    forAll(vec) { xs =>
      val n = math.max(xs.length - 1, 0)
      val const = Array.fill(xs.length)(7.5)
      Vec.diff(xs).length == n && Vec.relDiff(xs).length == n &&
        Vec.diff(const).forall(_ == 0.0)
    }

  property("shuffle: seed-deterministic permutation, input untouched") =
    forAll(vec, Gen.long) { (xs, seed) =>
      val before = xs.clone()
      val a = Vec.shuffle(xs, new SplittableRandom(seed))
      val b = Vec.shuffle(xs, new SplittableRandom(seed))
      a.sameElements(b) &&
        a.sorted.sameElements(xs.sorted) &&
        xs.sameElements(before)
    }

  property("interpolate: starts at min, monotone, lands near max") =
    forAll(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0.0, 100.0),
      Gen.choose(2, 64)) { (min, span, n) =>
      val max = min + span
      val g = Vec.interpolate(min, max, n)
      val tol = 1e-9 * (math.abs(min) + math.abs(max) + 1)
      g.length == n && g(0) == min &&
        g.sliding(2).forall(w => w(0) <= w(1)) &&
        math.abs(g(n - 1) - max) <= tol
    }

  property("cap lands in [lo, hi] and is idempotent") =
    forAll(element, element, element) { (x, a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val c = Vec.cap(x, lo, hi)
      lo <= c && c <= hi && Vec.cap(c, lo, hi) == c
    }

  property("weightExp: fixes 0 and 1 exactly, monotone for base > 1") =
    forAll(Gen.chooseNum(1.01, 10.0), Gen.chooseNum(0.0, 1.0),
      Gen.chooseNum(0.0, 1.0)) { (base, x, y) =>
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      Vec.weightExp(0.0, base) == 0.0 &&
        Vec.weightExp(1.0, base) == 1.0 &&
        Vec.weightExp(lo, base) <= Vec.weightExp(hi, base)
    }

  property("weightedMean with unit weights == mean, bit-exactly") =
    forAll(vec) { xs =>
      val m = Vec.weightedMean(xs, Array.fill(xs.length)(1.0))
      // x*1.0 == x and the unit-weight denominator sums to exactly n,
      // so the two folds are the same IEEE op sequence
      java.lang.Double.compare(m, Vec.mean(xs)) == 0 ||
        (m.isNaN && Vec.mean(xs).isNaN)
    }

  property("extractWindows: suffix decomposition with clamped sizes") =
    forAll(vec, Gen.choose(1, 20), Gen.choose(1, 5)) { (v, ref, act) =>
      Vec.extractWindows(v, ref, act, minRefSize = 1) match {
        case None =>
          // only legitimate when the clamped reference window is empty
          math.min(ref, v.length - math.min(act, v.length)) < 1
        case Some((r, a)) =>
          a.length == math.min(act, v.length) &&
            r.length == math.min(ref, v.length - a.length) &&
            (r ++ a).sameElements(v.takeRight(r.length + a.length))
      }
    }
}
