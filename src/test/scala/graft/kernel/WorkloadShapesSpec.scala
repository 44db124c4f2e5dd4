package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDetector

/** Behavioral regression against the reference's EXAMPLES.md: the three
  * documented workload shapes (CPU usage, membership counts, seasonal
  * series) with their recommended configs must reproduce the documented
  * qualitative behavior — fence/magnitude alarm on a bound-breaking
  * spike, lowrank (not highrank) alarms on a drop, ks sees a
  * seasonality break when the active window spans one season.
  * Reference: /root/reference/EXAMPLES.md:34-80.
  */
class WorkloadShapesSpec extends AnyFunSuite {

  private def scores(conf: AnomalyzerConf, warm: Seq[Double],
      probe: Double): (Map[String, Double], Double) = {
    val a = new Anomalyzer(conf, StreamingDetector.seriesHash("shape"))
    warm.foreach(a.push)
    val p = a.push(probe)
    val (probs, _) = a.evalByTest()
    (probs, p)
  }

  // deterministic "noise" so shapes are stable without an RNG
  private def wiggle(i: Int): Double = (i % 5 - 2) * 0.3

  test("CPU spike: fence + magnitude alarm when usage breaks the bound") {
    // EXAMPLES.md:36 — active=2, bounds [0, 80]; steady ~30% then spike
    val conf = AnomalyzerConf(sensitivity = 0.1, upperBound = 80,
      lowerBound = Some(0), activeSize = 2, nSeasons = 4,
      methods = Seq("magnitude", "fence"))
    val steady = (1 to 20).map(i => 30.0 + wiggle(i))
    val (calm, calmProb) = scores(conf, steady.dropRight(1), steady.last)
    val (spiky, spikeProb) = scores(conf, steady :+ 85.0, 92.0)
    assert(calm("fence") < 0.2, s"fence on steady load: $calm")
    assert(spiky("fence") > 0.8, s"fence must alarm past the bound: $spiky")
    assert(spiky("magnitude") > calm("magnitude"))
    assert(spikeProb > 0.8 && calmProb < 0.3)
  }

  test("membership drop: lowrank alarms, highrank stays quiet") {
    // EXAMPLES.md:52-68 — a count series that falls off a cliff
    val conf = AnomalyzerConf(activeSize = 2, nSeasons = 4,
      permCount = 200, methods = Seq("highrank", "lowrank"))
    val steady = (1 to 20).map(i => 100.0 + wiggle(i))
    val aLow = new Anomalyzer(conf, StreamingDetector.seriesHash("drop"))
    steady.foreach(aLow.push)
    aLow.push(25.0)
    aLow.push(20.0)
    val (probs, _) = aLow.evalByTest()
    // highrank/lowrank fold to max under "rank"; check directions via
    // separate configs
    val (lowOnly, _) = scores(conf.copy(methods = Seq("lowrank")),
      steady ++ Seq(25.0), 20.0)
    val (highOnly, _) = scores(conf.copy(methods = Seq("highrank")),
      steady ++ Seq(25.0), 20.0)
    assert(lowOnly("rank") > 0.8, s"lowrank must catch the drop: $lowOnly")
    assert(highOnly("rank") < 0.2, s"highrank must stay quiet: $highOnly")
    assert(probs("rank") > 0.8)
  }

  test("seasonal: ks flags a phase break when active window = one season") {
    // EXAMPLES.md:70-80 — active=10 (one season), nseasons=2
    val conf = AnomalyzerConf(activeSize = 10, nSeasons = 2,
      permCount = 200, methods = Seq("ks"))
    val season = (0 until 10).map(i => math.sin(2 * math.Pi * i / 10) * 10)
    val warm = (season ++ season ++ season).dropRight(1)
    // in-phase continuation: the active window is one full season again
    val (inPhase, _) = scores(conf, warm, season.last)
    // phase break: flat-line replaces the last season
    val aBreak = new Anomalyzer(conf, StreamingDetector.seriesHash("shape"))
    (season ++ season).foreach(aBreak.push)
    (0 until 10).foreach(_ => aBreak.push(25.0))
    val (broken, _) = (aBreak.evalByTest()._1, ())
    assert(broken("ks") > inPhase("ks"),
      s"ks must rank the phase break above in-phase: $broken vs $inPhase")
    assert(broken("ks") > 0.8)
  }
}
