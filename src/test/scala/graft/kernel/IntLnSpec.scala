package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class IntLnSpec extends AnyFunSuite {

  test("iln6 within one micro-unit of true ln over exhaustive small " +
    "and random large arguments; monotone; exact at powers of two") {
    assert(IntLn.iln6(1L) === 0L)
    // exhaustive over the range every realistic LM count lives in
    var n = 1L
    while (n <= 300000L) {
      val err = math.abs(IntLn.iln6(n) - 1e6 * math.log(n.toDouble))
      assert(err <= 1.0, s"n=$n err=$err")
      n += 1
    }
    // random large arguments up to 2^62 (the 128-bit numerator path)
    val rng = new java.util.SplittableRandom(0x1417L)
    (1 to 200000).foreach { _ =>
      val x = rng.nextLong(1L, 1L << 62)
      val err = math.abs(IntLn.iln6(x) - 1e6 * math.log(x.toDouble))
      assert(err <= 1.0, s"n=$x err=$err")
    }
    // powers of two are pure b*ln2 — the series contributes nothing
    (0 to 62).foreach { b =>
      val want = math.round(b * IntLn.Ln2S * 1000000.0 / IntLn.S)
      assert(IntLn.iln6(1L << b) === want)
    }
    // monotone non-decreasing on consecutive arguments (sampled)
    (1 to 100000).foreach { _ =>
      val x = rng.nextLong(1L, (1L << 62) - 1)
      assert(IntLn.iln6(x) <= IntLn.iln6(x + 1),
        s"iln6 not monotone at $x")
    }
  }
}
