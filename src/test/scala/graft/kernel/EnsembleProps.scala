package graft.kernel

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the ensemble combination rules
  * (reference anomalyze.go:145-241): weight table, sensitivity
  * short-circuit, probability bounds.
  */
object EnsembleProps extends Properties("kernel.Ensemble") {

  private val prob: Gen[Double] = Gen.chooseNum(0.0, 1.0)
  private val method: Gen[String] = Gen.oneOf(
    "magnitude", "fence", "cdf", "rank", "diff", "ks")
  private val probmap: Gen[Map[String, Double]] =
    Gen.mapOf(Gen.zip(method, prob))

  private val conf = AnomalyzerConf(
    delay = false, sensitivity = 0.1, upperBound = 5.0,
    lowerBound = None, activeSize = 1, nSeasons = 4,
    methods = Seq("magnitude"), permCount = 10)

  property("getWeight: 5.0 exactly for confident magnitude/fence, " +
    "0.5 otherwise") = forAll(method, prob) { (m, p) =>
    val w = Ensemble.getWeight(m, p)
    if ((m == "magnitude" || m == "fence") && p > 0.8) w == 5.0
    else w == 0.5
  }

  property("combine stays within [min, max] of the probabilities") =
    forAll(probmap) { pm =>
      val c = Ensemble.combine(pm, conf.copy(sensitivity = 0.0))
      if (pm.isEmpty) c == 0.0
      else {
        // sensitivity 0 disables the short-circuit (prob < 0 impossible)
        val (lo, hi) = (pm.values.min, pm.values.max)
        lo - 1e-12 <= c && c <= hi + 1e-12
      }
    }

  property("magnitude below sensitivity short-circuits to 0 no matter " +
    "what the other tests say") = forAll(probmap, prob) { (pm, mag) =>
    val sens = 0.5
    val out = Ensemble.combine(pm.updated("magnitude", mag),
      conf.copy(sensitivity = sens))
    if (mag < sens) out == 0.0
    else out >= 0.0
  }

  property("delay gate: short windows score 0, full windows score") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0))) { xs =>
      val data = xs.toArray
      val c = conf.copy(delay = true, activeSize = 1)
      val rng = new PermDraw(1L, 1L)
      val gated = Ensemble.eval(
        data.take(math.max(c.windowSize - 1, 0)), c, rng)
      gated == 0.0
    }
}
