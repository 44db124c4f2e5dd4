package graft.kernel

import java.util.SplittableRandom

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pooled KS permutation loop (the low-allocation fast path
  * every evaluator hits) to the general full-key-sort loop: identical
  * md5-keyed subsets, identical counts and divisions, so the bootstrap
  * p-values must match EXACTLY, draw identity for draw identity.
  */
class KsParitySpec extends AnyFunSuite {

  private val conf = AnomalyzerConf(activeSize = 2, nSeasons = 4,
    permCount = 200, methods = Seq("ks"))

  test("pooled fast path == general loop, exactly, across seeds/windows") {
    val gen = new SplittableRandom(0xC0FFEE)
    (1 to 25).foreach { trial =>
      val v = Array.fill(10)(math.rint(gen.nextDouble() * 1e4) / 1e2)
      if (trial % 5 == 0) { // exercise duplicate-heavy windows too
        v(3) = v(7); v(1) = v(7)
      }
      val seed = gen.nextLong()
      val fast = Tests.bootstrapKs(v, conf, new PermDraw(seed, trial))
        .getOrElse(fail("ks undefined"))
      // general loop on the same pool: same dist, same draw identity
      val (ref0, act0) = Vec.extractWindows(v, conf.referenceSize,
        conf.activeSize, conf.activeSize).get
      val dist = Tests.ksCore(ref0, act0)
      val general = Tests.generalKsLoop(v, ref0.length, act0.length,
        dist, conf, new PermDraw(seed, trial)).toDouble / conf.permCount
      assert(fast === general, s"trial $trial diverged (seed $seed)")
    }
  }

  test("p-values over a step-change window detect the shift") {
    val flat = Array(10.0, 10.2, 9.9, 10.1, 10.0, 9.8, 10.2, 10.0,
      30.0, 31.0) // active window jumps
    val p = Tests.bootstrapKs(flat, conf, new PermDraw(7L, 1L)).get
    assert(p > 0.9, s"KS bootstrap should flag the level shift, got $p")
  }
}
