package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the a36 generalized-ESD fold against an INDEPENDENT sequential
  * Scala reference on crafted series — the cases the corpus oracle may
  * never hit: symmetric-deviation ties (where the first-index removal
  * rule changes the round-2 statistic), degenerate windows going
  * constant mid-chain (the varnum=0 exclusion, per round), and exact
  * agreement of all three studentized statistics. The DuckDB oracle
  * pins cross-engine equality on the corpus; this spec pins the
  * SEMANTICS on inputs chosen to exercise every branch.
  */
class EsdSpec extends AnyFunSuite with SparkTestBase {

  private val w = Anomaly.EsdWindow
  private val k = Anomaly.EsdRounds

  /** Shared sequential reference — see [[EsdTestRef]]. */
  private def esdRef(win0: Array[Long]): (Seq[Double], Boolean) =
    EsdTestRef.esdRef(win0, w, k)

  private def runA36(values: Map[String, Seq[Double]]): Map[(String, Long),
      (Double, Double, Double, Long)] = {
    val dir = Files.createTempDirectory("graft-esd-corpus").toFile
    dir.deleteOnExit()
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = for {
      (series, vs) <- values.toSeq
      (v, i) <- vs.zipWithIndex
    } yield (i.toLong, new Timestamp(1700000000000L + i * 60000L), 1L,
      series, v, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    Catalog.queries("a36_esd")(spark, dir.getAbsolutePath).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
  }

  test("a36 fold == sequential reference on tie, spike, and smooth " +
    "series; constant-anywhere windows are excluded per the varnum rule") {
    // s_tie: window values symmetric around the mean at positions 3 and
    // 7 (mean 100: 100+40 and 100-40) — deviations TIE exactly, and
    // removing the first vs the second changes round 2, so this
    // observably pins the first-index rule.
    val tie = Seq.tabulate(w)(i =>
      if (i == 3) 140.0 else if (i == 7) 60.0 else 100.0)
    // force an exact tie: deviations |n·x − sx| tie when x3+x7 = 2·mean
    // of the rest — with 18 values at 100, sx = 2000, n=20:
    // |20·140−2000| = 800 = |20·60−2000|. ✓
    val series = Map(
      "s_tie" -> tie,
      "s_smooth" -> Seq.tabulate(w)(i => 50.0 + 3.0 * i + (i % 5)),
      "s_spike" -> (Seq.fill(w - 1)(10.0) :+ 500.0), // constant after
                                                      // spike removal
      "s_const" -> Seq.fill(w)(42.0))
    val out = runA36(series)

    series.foreach { case (name, vs) =>
      val micro = vs.map(v => math.round(v * 1e6)).toArray
      val (rs, ok) = esdRef(micro)
      val key = (name, (w - 1).toLong) // the one full window's last event
      if (!ok) {
        assert(!out.contains(key),
          s"$name: a round went constant — row must be excluded")
      } else {
        assert(out.contains(key), s"$name: expected an output row")
        val (r1, r2, r3, nAnom) = out(key)
        assert(r1 === rs(0), s"$name r1")
        assert(r2 === rs(1), s"$name r2")
        assert(r3 === rs(2), s"$name r3")
        val lam = Anomaly.EsdLambda
        val expectedN =
          if (rs(2) > lam(2)) 3L else if (rs(1) > lam(1)) 2L
          else if (rs(0) > lam(0)) 1L else 0L
        assert(nAnom === expectedN, s"$name n_anom")
      }
    }
    // the tie case must differ from the same window with the tied pair
    // swapped-in-time ONLY in which element is removed first — sanity
    // that the tie actually bites: round 1 removes position 3 (140),
    // not position 7 (60)
    val (rsTie, _) = esdRef(tie.map(v => math.round(v * 1e6)).toArray)
    val removedFirstManually = {
      var arr = tie.map(v => math.round(v * 1e6)).toVector.patch(3, Nil, 1)
      val n = w - 1
      val sx = arr.map(BigInt(_)).sum
      val sxx = arr.map(v => BigInt(v) * v).sum
      val varnum = n * sxx - sx * sx
      val maxdev = arr.map(x => (BigInt(n) * x - sx).abs).max
      maxdev.toDouble / n.toDouble /
        math.sqrt(varnum.toDouble / (n * (n - 1)).toDouble)
    }
    assert(rsTie(1) === removedFirstManually,
      "round 2 must see the window with the FIRST tied element removed")
  }

  test("a39 shares the fold: seasonal residuals of a flat-plus-spike " +
    "series exclude constant-residual windows the same way") {
    // all values identical within each hour-of-day bucket -> residuals
    // are exactly zero everywhere -> every window constant -> empty
    val dir = Files.createTempDirectory("graft-esd39-corpus").toFile
    dir.deleteOnExit()
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = (0 until 3 * w).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 3600000L), 1L,
        "flat", 7.0 + (i % 24), "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    val out = Catalog.queries("a39_seasonal_esd")(
      spark, dir.getAbsolutePath).collect()
    assert(out.isEmpty,
      "perfectly seasonal series has zero residuals everywhere — " +
        "every ESD window is constant and must be excluded")
  }
}
