package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.util.SplittableRandom

class VecSpec extends AnyFunSuite {

  test("mean / sum") {
    assert(Vec.mean(Array(1.0, 2.0, 3.0)) === 2.0)
    assert(Vec.mean(Array.empty[Double]).isNaN)
    assert(Vec.sum(Array(1.5, 2.5)) === 4.0)
  }

  test("rank: min-tie, 0-based") {
    assert(Vec.rank(Array(0.1, 2.05, 1.5, 2.5, 2.6, 2.55, 8.0)).toSeq ===
      Seq(0.0, 2.0, 1.0, 3.0, 5.0, 4.0, 6.0))
    // ties share the first sorted index
    assert(Vec.rank(Array(3.0, 1.0, 3.0, 2.0)).toSeq === Seq(2.0, 0.0, 2.0, 1.0))
  }

  test("ecdf: fraction of points <= q") {
    val f = Vec.ecdf(Array(1.0, 2.0, 2.0, 4.0))
    assert(f(0.5) === 0.0)
    assert(f(1.0) === 0.25)
    assert(f(2.0) === 0.75)
    assert(f(3.0) === 0.75)
    assert(f(5.0) === 1.0)
  }

  test("diff / relDiff") {
    assert(Vec.diff(Array(1.0, 3.0, 2.0)).toSeq === Seq(2.0, -1.0))
    assert(Vec.relDiff(Array(2.0, 3.0, 1.5)).toSeq === Seq(0.5, -0.5))
    assert(Vec.diff(Array(1.0)).isEmpty)
  }

  test("cap / weightExp") {
    assert(Vec.cap(1.5, 0, 1) === 1.0)
    assert(Vec.cap(-0.5, 0, 1) === 0.0)
    assert(Vec.weightExp(0, 10) === 0.0)
    assert(Vec.weightExp(1, 10) === 1.0)
    assert(math.abs(Vec.weightExp(0.5, 10) - (math.sqrt(10) - 1) / 9) < 1e-15)
  }

  test("weightedMean") {
    assert(Vec.weightedMean(Array(1.0, 0.0), Array(3.0, 1.0)) === 0.75)
    assert(Vec.weightedMean(Array.empty, Array.empty).isNaN)
  }

  test("interpolate: cumulative-step linspace") {
    val g = Vec.interpolate(0.0, 1.0, 5)
    assert(g.length === 5)
    assert(g(0) === 0.0)
    assert(math.abs(g(4) - 1.0) < 1e-12)
    assert(math.abs(g(1) - 0.25) < 1e-15)
  }

  test("extractWindows: exact split, README example") {
    // README.md:13 — [1..9], active 1, seasons 4 => active [9], ref [5,6,7,8]
    val v = (1 to 9).map(_.toDouble).toArray
    val Some((ref, act)) = Vec.extractWindows(v, 4, 1, 1)
    assert(ref.toSeq === Seq(5.0, 6.0, 7.0, 8.0))
    assert(act.toSeq === Seq(9.0))
  }

  test("extractWindows: clamping on short input") {
    val v = Array(1.0, 2.0, 3.0)
    // active clamps to min(5,3)=3, ref to min(4, 0)=0 => below minRef 1
    assert(Vec.extractWindows(v, 4, 5, 1).isEmpty)
    // minRef -1 (fence): always succeeds
    val Some((ref0, act0)) = Vec.extractWindows(v, 4, 5, -1)
    assert(ref0.isEmpty && act0.toSeq === Seq(1.0, 2.0, 3.0))
    // partial reference
    val Some((ref1, act1)) = Vec.extractWindows(v, 4, 1, 1)
    assert(ref1.toSeq === Seq(1.0, 2.0) && act1.toSeq === Seq(3.0))
  }

  test("shuffle: seeded, deterministic, a permutation") {
    val v = (1 to 10).map(_.toDouble).toArray
    val a = Vec.shuffle(v, new SplittableRandom(7))
    val b = Vec.shuffle(v, new SplittableRandom(7))
    assert(a.toSeq === b.toSeq)
    assert(a.sorted.toSeq === v.toSeq)
    assert(v.toSeq === (1 to 10).map(_.toDouble)) // input untouched
  }
}
