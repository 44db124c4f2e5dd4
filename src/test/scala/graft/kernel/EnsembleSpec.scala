package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class ConfSpec extends AnyFunSuite {
  test("defaults: methods, seasons, permCount, sensitivity") {
    val c = AnomalyzerConf.validated(AnomalyzerConf(activeSize = 1))
    assert(c.methods === Seq("magnitude", "ks"))
    assert(c.nSeasons === 4)
    assert(c.referenceSize === 4)
    assert(c.permCount === 500) // ks is a permutation method
    assert(c.sensitivity === 0.1)
  }

  test("validation errors mirror the reference") {
    assert(AnomalyzerConf.validate(
      AnomalyzerConf(activeSize = 1, methods = Seq("bogus"))).isLeft)
    assert(AnomalyzerConf.validate(AnomalyzerConf(activeSize = 0)).isLeft)
    assert(AnomalyzerConf.validate( // ref window 1*3=3 < 4
      AnomalyzerConf(activeSize = 1, nSeasons = 3)).isLeft)
    assert(AnomalyzerConf.validate(AnomalyzerConf(activeSize = 2,
      methods = Seq("fence"), upperBound = 1, lowerBound = Some(1))).isLeft)
    assert(AnomalyzerConf.validate(AnomalyzerConf(activeSize = 2,
      methods = Seq("fence"), upperBound = 1, lowerBound = Some(2))).isLeft)
    // no-lower-bound fence with upperBound only is fine
    assert(AnomalyzerConf.validate(AnomalyzerConf(activeSize = 2,
      methods = Seq("fence"), upperBound = 5)).isRight)
  }
}

class TestsSpec extends AnyFunSuite {
  // the reference's e2e fixture (anomalyze_test.go:28-46) after Push(8.0)
  private val v = Array(0.1, 2.05, 1.5, 2.5, 2.6, 2.55, 8.0)
  private val conf = AnomalyzerConf.validated(AnomalyzerConf(
    sensitivity = 0.1, upperBound = 5, lowerBound = Some(0), activeSize = 1,
    nSeasons = 4,
    methods = Seq("cdf", "fence", "highrank", "lowrank", "magnitude")))

  test("magnitude on the e2e fixture caps to 1") {
    // ref [1.5,2.5,2.6,2.55] mean 2.2875; active [8] => pdiff 2.497 -> cap 1
    val Some(p) = Tests.magnitude(v, conf)
    assert(math.abs(p - (8.0 - 2.2875) / 2.2875) < 1e-12)
    assert(Vec.cap(p, 0, 1) === 1.0)
  }

  test("magnitude zero-reference special cases") {
    val z = Array(0.0, 0.0, 0.0, 0.0, 0.0)
    assert(Tests.magnitude(z, conf) === Some(0.0))
    assert(Tests.magnitude(Array(0.0, 0.0, 0.0, 0.0, 3.0), conf) === Some(1.0))
  }

  test("fence: midpoint distance with both bounds") {
    // x=8, mid=2.5, halfRange=2.5 => distance 2.2 -> cap 1 -> weightExp = 1
    assert(Tests.fence(v, conf) === 1.0)
    // upper-bound-only variant: x/U = 2/5 => weightExp(0.4,10)
    val cU = conf.copy(lowerBound = None)
    val p = Tests.fence(Array(1.0, 3.0, 2.0), cU.copy(activeSize = 1))
    assert(math.abs(p - (math.pow(10, 0.4) - 1) / 9) < 1e-12)
  }

  test("cdf on the e2e fixture") {
    // |diffs| = [1.95,0.55,1.0,0.1,0.05,5.45]; ref=[1.0,0.1,0.05], act=[5.45]
    // activeDiff = 5.45 - 0.38333 > all ref diffs => percentile 1 => prob 1
    assert(Tests.cdf(v, conf) === Some(1.0))
  }

  test("highrank ~ P(rank of tail < 6), lowrank 0 on the e2e fixture") {
    val rng = new PermDraw(1, 1)
    val Some(hi) = Tests.rankTest(v, conf, rng, (x, y) => x < y)
    // active rank-sum is the max rank (6): permuted sum < 6 w.p. 6/7
    assert(math.abs(hi - 6.0 / 7.0) < 0.06)
    val Some(lo) = Tests.rankTest(v, conf, new PermDraw(2, 1), (x, y) => x > y)
    assert(lo === 0.0)
  }

  test("ks: divisibility gate") {
    // active 2, seasons 2 => ref 4, 4 % 2 == 0 -> defined
    val c2 = AnomalyzerConf.validated(AnomalyzerConf(
      activeSize = 2, nSeasons = 2, methods = Seq("ks"), permCount = 50))
    val data = (1 to 6).map(_.toDouble).toArray
    assert(Tests.ksStat(data, c2).isDefined)
    // active 3, seasons 2 => ref 6, but clamp on n=7: ref 4, 4 % 3 != 0 -> NA
    val c3 = AnomalyzerConf.validated(AnomalyzerConf(
      activeSize = 3, nSeasons = 2, methods = Seq("ks"), permCount = 50))
    assert(Tests.ksStat((1 to 7).map(_.toDouble).toArray, c3).isEmpty)
  }

  test("ks statistic: identical windows give d ~ 0 shifted windows give d ~ 1") {
    val c = AnomalyzerConf.validated(AnomalyzerConf(
      activeSize = 4, nSeasons = 1, methods = Seq("ks"), permCount = 10))
    val same = Array(1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0)
    val Some(d0) = Tests.ksStat(same, c)
    assert(d0 <= 0.25 + 1e-12)
    val shifted = Array(1.0, 2.0, 3.0, 4.0, 101.0, 102.0, 103.0, 104.0)
    val Some(d1) = Tests.ksStat(shifted, c)
    assert(d1 === 1.0)
  }
}

class EnsembleSpec extends AnyFunSuite {
  private val conf = AnomalyzerConf.validated(AnomalyzerConf(
    sensitivity = 0.1, upperBound = 5, lowerBound = Some(0), activeSize = 1,
    nSeasons = 4,
    methods = Seq("cdf", "fence", "highrank", "lowrank", "magnitude")))

  test("reference e2e: prob > 0.5 after Push(8.0)") {
    val a = new Anomalyzer(conf)
    a.update(Seq(0.1, 2.05, 1.5, 2.5, 2.6, 2.55))
    val prob = a.push(8.0)
    assert(prob > 0.5, s"prob was $prob")
    // deterministic expected value: weights 5,5,.5,.5 on probs 1,1,1,~6/7
    assert(prob > 0.9 && prob <= 1.0)
  }

  test("rank folding takes the max of highrank/lowrank") {
    val probmap = Ensemble.evalByTest(
      Array(0.1, 2.05, 1.5, 2.5, 2.6, 2.55, 8.0), conf, new PermDraw(3, 1))
    assert(probmap.contains("rank"))
    assert(!probmap.contains("highrank") && !probmap.contains("lowrank"))
    assert(probmap("rank") > 0.7)
  }

  test("magnitude short-circuit zeroes the ensemble") {
    // steady series: magnitude ~ 0 < sensitivity => overall 0 even though
    // fence distance is nonzero
    val a = new Anomalyzer(conf)
    a.update(Seq(2.0, 2.0, 2.0, 2.0, 2.0, 2.0))
    assert(a.eval() === 0.0)
  }

  test("delay gate returns 0 until the buffer fills") {
    val c = conf.copy(delay = true)
    val a = new Anomalyzer(c)
    a.update(Seq(1.0, 2.0, 3.0)) // 3 < windowSize 5
    assert(a.eval() === 0.0)
    a.update(Seq(4.0, 50.0))
    assert(a.eval() > 0.0)
  }

  test("buffer stays bounded at windowSize") {
    val a = new Anomalyzer(conf)
    a.update((1 to 100).map(_.toDouble))
    assert(a.data.length === conf.windowSize)
    assert(a.data.toSeq === (96 to 100).map(_.toDouble))
  }

  test("getWeight upweights magnitude/fence above 0.8") {
    assert(Ensemble.getWeight("magnitude", 0.9) === 5.0)
    assert(Ensemble.getWeight("magnitude", 0.8) === 0.5)
    assert(Ensemble.getWeight("fence", 0.81) === 5.0)
    assert(Ensemble.getWeight("cdf", 0.99) === 0.5)
  }

  test("empty probmap (all NA) yields 0") {
    // single point, magnitude needs ref>=1 => with n=1 ref clamps to 0 -> NA
    val c = AnomalyzerConf.validated(
      AnomalyzerConf(activeSize = 1, methods = Seq("magnitude")))
    assert(Ensemble.eval(Array(5.0), c, new PermDraw(1, 1)) === 0.0)
  }

  test("permutation tests are deterministic given the seed") {
    val c = AnomalyzerConf.validated(AnomalyzerConf(
      activeSize = 2, nSeasons = 2, permCount = 100,
      methods = Seq("highrank", "diff", "ks")))
    val data = Array(1.0, 5.0, 2.0, 6.0, 3.0, 9.0)
    val p1 = Ensemble.eval(data, c, new PermDraw(99, 7))
    val p2 = Ensemble.eval(data, c, new PermDraw(99, 7))
    assert(p1 === p2)
  }
}
