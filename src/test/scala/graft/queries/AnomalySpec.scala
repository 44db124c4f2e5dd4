package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.util.SplittableRandom

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.kernel.{AnomalyzerConf, Ensemble, Tests}
import graft.sources.Tables

/** Pins the SQL-expressed deterministic anomaly statistics (a10, a11)
  * to the sequential kernel, row for row, exactly — the same contract
  * a09 has via the shared DuckDB oracle shapes.
  */
class AnomalySpec extends AnyFunSuite with SparkTestBase {

  // all constants derived from the production spec so a spec change
  // fails these pins loudly instead of silently testing stale values
  private val spec = Anomaly.spec
  private val wSize = spec.windowSize

  private def rnd6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** (event_type, event_id) -> full window, oldest first. */
  private lazy val windows: Map[(String, Long), Array[Double]] = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("arr",
        collect_list(col("value")).over(w.rowsBetween(-(wSize - 1), 0)))
      .filter(col("rn") >= wSize)
      .select(col("event_type"), col("event_id"), col("arr"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
      .toMap
  }

  test("a21 IQR fence invariants: fences bracket the box, flags are " +
    "exactly the fence comparison, corpus has real outliers") {
    val out = Catalog.queries("a21_iqr_fence")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, q1, q3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (lo, hi, flag) = (r.getDouble(5), r.getDouble(6), r.getBoolean(7))
      assert(q1 <= q3, s"quartiles inverted at ${r.getLong(1)}")
      assert(lo <= q1 && q3 <= hi, "fences must bracket the box")
      assert(flag === (v < lo || v > hi), "flag != fence comparison")
    }
    // the corpus's injected spikes must actually trip an adaptive fence
    assert(out.count(_.getBoolean(7)) > 0, "expected IQR outliers")
  }

  test("a15 EMA invariants: constant series reproduces the value " +
    "exactly; outputs bounded by the window") {
    val out = Catalog.queries("a15_ema_smooth")(spark, sfDir)
    val h = Anomaly.EmaHorizon // the query's own horizon, not a copy
    // on the real corpus every ema must lie inside its trailing
    // window's [min, max] — a weighted mean cannot escape its inputs
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val bounds = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("lo", min(col("value")).over(w.rowsBetween(-(h - 1), 0)))
      .withColumn("hi", max(col("value")).over(w.rowsBetween(-(h - 1), 0)))
      .filter(col("rn") >= h)
      .select(col("event_type"), col("event_id"), col("lo"), col("hi"))
    val joined = out.join(bounds, Seq("event_type", "event_id"))
    val bad = joined.filter(col("ema_v") < col("lo") - 1e-6 ||
      col("ema_v") > col("hi") + 1e-6).count()
    assert(bad === 0, "EMA must be a convex combination of the window")
    // constant series: the power-of-two weights normalize EXACTLY
    // (left-fold of w_i * v == norm * v bit-for-bit), so ema == value
    // with zero rounding error — same fold the query expression runs
    val weights = (1 to h).map(j => math.pow(2.0, (j - h).toDouble))
    val norm = 2.0 - math.pow(2.0, 1.0 - h)
    val ema = weights.map(_ * 7.25e6).foldLeft(0.0)(_ + _) / norm / 1e6
    assert(ema === 7.25)
  }

  test("a10 ks grid statistic == Tests.ksStat, exactly") {
    val conf = AnomalyzerConf(
      activeSize = spec.activeSize, nSeasons = spec.nSeasons)
    // same lcm scale the query uses: L = lcm(refLen, activeLen)
    val ksL = Anomaly.KsGrid.lcm(wSize - spec.activeSize, spec.activeSize)
    val got = Catalog.queries("a10_anomaly_ks_stat")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size === windows.size)
    windows.foreach { case (key, arr) =>
      val expected = Tests.ksStat(arr, conf)
        .getOrElse(fail(s"kernel ksStat undefined for $key"))
      val (num, stat) = got(key)
      assert(stat === expected, s"row $key: query $stat kernel $expected")
      assert(num === math.round(expected * ksL), s"row $key integer form")
    }
  }

  test("detector composes over the q27 resampled grid end to end") {
    // the full pipeline story: irregular events -> regular hourly grid
    // (resample + ffill) -> ensemble scoring on the grid as the series
    val grid = Catalog.queries("q27_resample_ffill")(spark, sfDir)
    val scored = graft.operators.Detectors.withProbsFused(
        grid, col("event_type"), col("hour_ts"), Nil,
        col("value_ffill"), spec)
      .filter(col("rn") >= wSize)
    val rows = scored.select("event_type", "prob_ensemble").collect()
    val gridRows = grid.count()
    val nSeries = grid.select("event_type").distinct().count()
    assert(rows.length === gridRows - nSeries * (wSize - 1),
      "one score per fully-warmed grid point per series")
    rows.foreach { r =>
      val p = r.getDouble(1)
      assert(!p.isNaN && p >= 0.0 && p <= 1.0, s"prob out of range: $p")
    }
  }

  test("a11 by-test probs/weights/ensemble == kernel evalByTest, exactly") {
    val conf = AnomalyzerConf(
      activeSize = spec.activeSize, nSeasons = spec.nSeasons,
      upperBound = spec.upperBound, lowerBound = spec.lowerBound,
      sensitivity = spec.sensitivity,
      methods = Seq("magnitude", "fence", "cdf"))
    val got = Catalog.queries("a11_anomaly_by_test")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(got.size === windows.size)
    windows.foreach { case (key, arr) =>
      // deterministic tests ignore the draw; any identity works
      val probmap = Ensemble.evalByTest(arr, conf, new graft.kernel.PermDraw(0L, 0L))
      val weights = Ensemble.weights(probmap)
      val ensemble = Ensemble.combine(probmap, conf)
      val (pm, pf, pc, wm, wf, pe) = got(key)
      assert(pm === rnd6(probmap("magnitude")), s"$key magnitude")
      assert(pf === rnd6(probmap("fence")), s"$key fence")
      assert(pc === rnd6(probmap("cdf")), s"$key cdf")
      assert(wm === weights("magnitude"), s"$key w_magnitude")
      assert(wf === weights("fence"), s"$key w_fence")
      assert(pe === rnd6(ensemble), s"$key ensemble")
    }
  }

  test("a22 lag-1 autocorrelation == exact BigInt sequential recompute; " +
    "|r| <= 1") {
    val got = Catalog.queries("a22_autocorr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // mirror both engines: the *1e6 happens in IEEE double, THEN the
    // decimal HALF_UP round — not an exact decimal shift
    def fix6(v: Double): BigInt =
      BigInt(JBigDecimal.valueOf(v * 1e6)
        .setScale(0, RoundingMode.HALF_UP).longValueExact())
    val expected = windows.flatMap { case (key, arr) =>
      val x6 = arr.map(fix6)
      val xs = x6.init // lagged value
      val ys = x6.tail
      val m = BigInt(xs.length) // = windowSize - 1 pairs
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(v => v * v).sum
      val syy = ys.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val vx = m * sxx - sx * sx
      val vy = m * syy - sy * sy
      if (vx <= 0 || vy <= 0) None
      else Some(key -> rnd6((m * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, r) =>
      assert(got(key) === r, s"$key")
      assert(math.abs(got(key)) <= 1.0 + 5e-7, s"$key out of [-1,1]")
    }
  }

  test("a23 variance ratio == exact BigInt sequential recompute; " +
    "flag equals the 4x threshold; corpus has volatility spikes") {
    val got = Catalog.queries("a23_varratio")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    def fix6(v: Double): BigInt =
      BigInt(JBigDecimal.valueOf(v * 1e6)
        .setScale(0, RoundingMode.HALF_UP).longValueExact())
    val a = spec.activeSize      // 2
    val nr = wSize - a           // 8 reference points
    // Bessel factors: (a-1)·a in the active kernel vs (nr-1)·nr in the
    // reference kernel → the integer constant nr(nr-1)/(a(a-1)) = 28
    val bessel = BigInt(nr * (nr - 1) / (a * (a - 1)))
    val expected = windows.flatMap { case (key, arr) =>
      val x6 = arr.map(fix6)
      val ref = x6.take(nr); val act = x6.drop(nr)
      val sr = ref.sum; val srr = ref.map(v => v * v).sum
      val sa = act.sum; val saa = act.map(v => v * v).sum
      val vr = BigInt(nr) * srr - sr * sr
      if (vr <= 0) None
      else Some(key ->
        ((BigInt(a) * saa - sa * sa) * bessel).toDouble / vr.toDouble)
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, r) =>
      val (ratio, flag) = got(key)
      assert(ratio === r, s"$key")
      assert(flag === (ratio > 4.0), s"$key flag")
      assert(ratio >= 0.0, s"$key variance ratio must be non-negative")
    }
    assert(got.values.exists(_._2), "corpus should trip the 4x threshold")
  }

  test("a24 Holt forecast == sequential same-order dot recompute; " +
    "filter mass within the truncation bound of 1") {
    val h = Anomaly.HoltHorizon
    val coefs = Anomaly.holtCoefs.map(_.doubleValue()) // exact dyadics
    // the truncated filter's response to a constant series is the
    // coefficient sum; the transient decays as |λ|^h = 2^(-h/2) times
    // an O(1) constant from the complex-pair rotation (measured 1.07)
    val mass = coefs.sum
    assert(math.abs(mass - 1.0) <= math.pow(2.0, 1.0 - h / 2.0),
      s"filter mass $mass outside the truncation bound")
    val got = Catalog.queries("a24_holt_resid")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val expected = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("arr",
        collect_list(expr("cast(round(value * 1e6) as bigint)"))
          .over(w.rowsBetween(-h, -1)))
      .filter(col("rn") >= h + 1)
      .select(col("event_type"), col("event_id"), col("value"), col("arr"))
      .collect()
      .map { r =>
        val arr = r.getSeq[Long](3)
        // mirror the engines' left fold exactly: per-element long ->
        // double promote, multiply, accumulate in array order
        val fc = arr.zip(coefs).map { case (x, c) => x.toDouble * c }
          .foldLeft(0.0)(_ + _) / 1e6
        (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), fc))
      }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, (v, fc)) =>
      val (gv, gf, gr) = got(key)
      assert(gv === v, s"$key value")
      assert(gf === fc, s"$key forecast")
      assert(gr === v - fc, s"$key residual")
    }
  }

  test("a25 Grubbs == exact BigInt sequential recompute; flag equals " +
    "the critical-value compare; corpus trips the fence") {
    val got = Catalog.queries("a25_grubbs")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    val gw = 20 // a25's window, independent of the ensemble spec
    val wspec = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val expected = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wspec))
      .withColumn("arr",
        collect_list(expr("cast(round(value * 1e6) as bigint)"))
          .over(wspec.rowsBetween(-(gw - 1), 0)))
      .filter(col("rn") >= gw)
      .select(col("event_type"), col("event_id"), col("arr"))
      .collect()
      .flatMap { r =>
        val arr = r.getSeq[Long](2).map(BigInt(_))
        val s = arr.sum
        val varnum = BigInt(gw) * arr.map(v => v * v).sum - s * s
        if (varnum == 0) None
        else {
          // same double-op order as both engines: convert, /w, /sqrt
          val maxdev = arr.map(v => (BigInt(gw) * v - s).abs).max
          val g = maxdev.toDouble / gw.toDouble /
            math.sqrt(varnum.toDouble / (gw * (gw - 1)).toDouble)
          Some((r.getString(0), r.getLong(1)) -> g)
        }
      }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, g) =>
      val (gg, flag) = got(key)
      assert(gg === g, s"$key")
      assert(flag === (g > 2.708), s"$key flag")
      assert(g >= 0.0, s"$key Grubbs statistic must be non-negative")
    }
    assert(got.values.exists(_._2), "corpus should contain Grubbs outliers")
  }

  test("a26 Page-Hinkley == exact int64 sequential recompute; statistic " +
    "is non-negative; corpus contains drift alarms") {
    val got = Catalog.queries("a26_page_hinkley")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    val wspec = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val ordered = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wspec))
      .select(col("event_type"), col("rn").cast("long").as("rn"),
        col("event_id"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // HALF_UP like both engines' round(double) — Math.round would
    // differ on negative exact halves
    def roundHalfUp(x: Double): Long =
      JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValue()
    val expected = ordered.toSeq.flatMap { case (tpe, rows) =>
      var sp = 0L; var mt = 0L; var mmin = Long.MaxValue
      rows.map { case (_, rn, id, v6) =>
        sp += v6
        mt += roundHalfUp((rn * v6 - sp).toDouble / rn) - 5000L
        mmin = math.min(mmin, mt)
        (tpe, id) -> ((mt - mmin).toDouble / 1e6)
      }
    }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, ph) =>
      val (gph, flag) = got(key)
      assert(gph === ph, s"$key")
      assert(flag === (ph > 5.0), s"$key flag")
      assert(ph >= 0.0, s"$key PH statistic must be non-negative")
    }
    assert(got.values.exists(_._2), "corpus should contain drift alarms")
  }

  test("a27 Benford chi2 == sequential recompute in the same term " +
    "order; digit counts partition n; near-Benford corpus stays quiet") {
    val got = Catalog.queries("a27_benford")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = byType.map { case (tpe, v6s) =>
      val digits = v6s.map(v => v.toString.charAt(0) - '0')
      val n = digits.length
      val counts = (1 to 9).map(d => digits.count(_ == d))
      assert(counts.sum === n, s"$tpe digit counts must partition n")
      // identical left-assoc 9-term chain as both engines
      val nd = n.toDouble
      var chi2 = 0.0
      (1 to 9).foreach { d =>
        val p = Anomaly.BenfordP(d - 1)
        val c = counts(d - 1).toDouble
        chi2 = chi2 + ((c - nd * p) * (c - nd * p)) / (nd * p)
      }
      tpe -> ((n.toLong, rnd6(chi2)))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (tpe, (n, chi2)) =>
      val (gn, gchi2, flag) = got(tpe)
      assert(gn === n, s"$tpe n")
      assert(gchi2 === chi2, s"$tpe chi2")
      assert(flag === (chi2 > 20.09), s"$tpe flag")
    }
    // the synthetic values are lognormal-ish (near scale-invariant), so
    // at this small n NO series should trip the 20.09 screen — the
    // discriminating fire-on-deviation case is covered at sf0.01 by the
    // driver oracle, where the larger n pushes 3 of 5 series over
    assert(got.values.forall(v => v._2 > 0.0), "chi2 must be positive")
  }

  test("a28 runs test == exact sequential recompute (sort-picked " +
    "median, run count, z in the same op order)") {
    val got = Catalog.queries("a28_runs_test")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsl"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val expected = rows.map { case (tpe, rs) =>
      val byValue = rs.sortBy(r => (r._4, r._3))
      val med = byValue(((byValue.length + 1) / 2) - 1)._4
      val signs = rs.sortBy(r => (r._2, r._3))
        .filter(_._4 != med).map(_._4 > med)
      val runs = 1L + signs.sliding(2).count(w =>
        w.length == 2 && w(0) != w(1))
      val n1 = signs.count(identity).toLong
      val n2 = signs.length - n1
      val n = n1 + n2
      val p2 = BigInt(2) * n1 * n2
      val mu = 1.0 + p2.toDouble / n.toDouble
      val vr = (p2 * (p2 - n)).toDouble /
        (BigInt(n) * n * (n - 1)).toDouble
      val z = rnd6((runs.toDouble - mu) / math.sqrt(vr))
      tpe -> ((n1, n2, runs, z))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (tpe, (n1, n2, runs, z)) =>
      val (g1, g2, gr, gz, flag) = got(tpe)
      assert((g1, g2, gr) === ((n1, n2, runs)), s"$tpe counts")
      assert(gz === z, s"$tpe z")
      assert(flag === (math.abs(z) > 2.576), s"$tpe flag")
    }
  }

  /** (event_type) -> (hod, v6) rows, for a31/a32. */
  private lazy val hodRows: Map[String, Array[(Long, Long)]] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toArray).toMap

  test("a31 periodogram == exact BigInt recompute; the corpus's " +
    "injected diurnal cycle puts amp24h on top") {
    val got = Catalog.queries("a31_periodogram")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val expected = hodRows.map { case (tpe, rows) =>
      val n = rows.length
      def amp(k: Int): Double = {
        val sc = rows.map { case (h, v) =>
          BigInt(v) * Anomaly.Cos6(((k * h) % 24).toInt) }.sum
        val ss = rows.map { case (h, v) =>
          BigInt(v) * Anomaly.Sin6(((k * h) % 24).toInt) }.sum
        rnd6(2.0 * math.sqrt(sc.toDouble * sc.toDouble +
          ss.toDouble * ss.toDouble) / n / 1e12)
      }
      tpe -> ((n.toLong, amp(1), amp(2), amp(3)))
    }
    assert(got === expected)
    // the corpus's hour-of-day profile is periodic but not a pure
    // sinusoid — some series carry most mass in the 12h harmonic — so
    // assert diurnal-band ENERGY, not fundamental dominance
    got.values.foreach { case (_, a24, a12, a8) =>
      assert(a24 >= 0.0 && a12 >= 0.0 && a8 >= 0.0)
      assert(Seq(a24, a12, a8).max > 1.0,
        "the injected daily cycle must be visible in the diurnal band")
    }
  }

  test("a32 seasonal strength == exact ANOVA recompute (ordered " +
    "hod fold); strength in [0,1] and positive on this corpus") {
    val got = Catalog.queries("a32_seasonal_strength")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val expected = hodRows.map { case (tpe, rows) =>
      val n = rows.length
      val ss2 = rows.map { case (_, v) => BigInt(v) * BigInt(v) }.sum
      val stot = rows.map(_._2).map(BigInt(_)).sum
      val byHod = rows.groupBy(_._1).toSeq.sortBy(_._1)
      var between = 0.0
      byHod.foreach { case (_, rs) =>
        val sh = rs.map(_._2).sum // int64 like the engines
        between = between + (sh.toDouble * sh.toDouble) / rs.length.toDouble
      }
      val ssTotal = ss2.toDouble - stot.toDouble * stot.toDouble / n
      val strength =
        if (ssTotal == 0.0) 0.0
        else math.max(0.0, 1.0 - (ss2.toDouble - between) / ssTotal)
      tpe -> ((n.toLong, rnd6(strength)))
    }
    assert(got === expected)
    got.values.foreach { case (_, s) =>
      assert(s >= 0.0 && s <= 1.0)
      assert(s > 0.0, "hour-of-day structure exists in this corpus")
    }
  }

  test("a33 lead-lag grid == exact BigInt recompute; exactly one best " +
    "lag per pair under the total (corr, |lag|, lag) order") {
    val got = Catalog.queries("a33_leadlag")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_trunc("hour", col("ts")).cast("long").as("hsec"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val types = hourly.keys.map(_._1).toSeq.distinct.sorted
    val expected = (for {
      ta <- types; tb <- types if ta < tb; lag <- -3L to 3L
    } yield {
      // .toSeq BEFORE collect: collecting a Map into pair tuples would
      // rebuild a Map and silently dedup equal (x6, y6) pairs
      val rows = hourly.toSeq.collect {
        case ((t, h), x6) if t == ta && hourly.contains((tb, h + lag * 3600))
          => (BigInt(x6), BigInt(hourly((tb, h + lag * 3600))))
      }
      val n = BigInt(rows.length)
      val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
      val sxx = rows.map(r => r._1 * r._1).sum
      val syy = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._1 * r._2).sum
      val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
      val corr = if (vx == 0 || vy == 0) 0.0
        else rnd6((n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
      (s"$ta~$tb", lag) -> ((rows.length.toLong, corr))
    }).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, (n, corr)) =>
      val (gn, gcorr, _) = got(key)
      assert(gn === n, s"$key n_overlap")
      assert(gcorr === corr, s"$key corr")
    }
    // argmax: exactly one flagged row per pair, and it attains the max
    got.groupBy(_._1._1).foreach { case (pair, rows) =>
      val best = rows.filter(_._2._3)
      assert(best.size === 1, s"$pair must flag exactly one best lag")
      assert(best.head._2._2 === rows.values.map(_._2).max,
        s"$pair best lag must attain the max correlation")
    }
  }

  test("a34 Hurst == exact BigInt variance-time recompute; estimates " +
    "stay in the plausible band") {
    val got = Catalog.queries("a34_hurst")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val series = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("tus"),
        col("event_id"), expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._4).toArray)
      .toMap
    val scales = Seq(4, 16, 64)
    val xs = scales.map(m => math.round(1e6 * math.log(m.toDouble)))
    val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
    val expected = series.flatMap { case (tpe, vs) =>
      val pts = scales.zip(xs).flatMap { case (m, x6) =>
        val sums = vs.grouped(m).filter(_.length == m)
          .map(b => BigInt(b.sum)).toSeq
        val nb = BigInt(sums.length)
        val (s1, s2) = (sums.sum, sums.map(s => s * s).sum)
        val num = nb * s2 - s1 * s1
        val den = BigInt(m) * m * nb * nb
        if (num > 0)
          Some((x6, math.round(1e6 * math.log(num.toDouble / den.toDouble))))
        else None
      }
      if (pts.length != scales.length) None
      else {
        val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        Some(tpe -> rnd6((3 * sxy - sx * sy).toDouble /
          (3L * sxx - sx * sx).toDouble / 2.0 + 1.0))
      }
    }
    assert(got === expected)
    got.values.foreach(h => assert(h > 0.0 && h < 1.5,
      s"Hurst estimate $h outside the plausible band"))
  }

  test("a35 burstiness == exact BigInt recompute; CV2 positive and " +
    "gaps partition the series span") {
    val got = Catalog.queries("a35_interarrival")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("tus"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    val expected = byType.flatMap { case (tpe, rows) =>
      val gaps = rows.map(_._2).sliding(2).filter(_.length == 2)
        .map(w => BigInt(w(1) - w(0))).toSeq
      val n = BigInt(gaps.length)
      val (sg, sgg) = (gaps.sum, gaps.map(g => g * g).sum)
      if (sg <= 0) None
      else Some(tpe -> ((gaps.length.toLong,
        rnd6((n * sgg - sg * sg).toDouble / (sg * sg).toDouble),
        rnd6(sg.toDouble / gaps.length / 1e6))))
    }
    assert(got === expected)
    got.foreach { case (tpe, (n, cv2, meanGap)) =>
      assert(n > 0 && cv2 >= 0.0 && meanGap > 0.0, s"$tpe sanity")
      // gaps partition the span: n_gaps = points - 1
      assert(n === byType(tpe).length - 1L, s"$tpe gap count")
    }
  }

  test("a36 generalized ESD == exact BigInt sequential recompute " +
    "(3 unrolled removal rounds); n_anom equals the threshold CASE") {
    val got = Catalog.queries("a36_esd")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    val w = Anomaly.EsdWindow
    val k = Anomaly.EsdRounds
    val lam = Anomaly.EsdLambda
    val wspec = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val expected = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wspec))
      .withColumn("arr",
        collect_list(expr("cast(round(value * 1e6) as bigint)"))
          .over(wspec.rowsBetween(-(w - 1), 0)))
      .filter(col("rn") >= w)
      .select(col("event_type"), col("event_id"), col("arr"))
      .collect()
      .flatMap { row =>
        var arr = row.getSeq[Long](2).toVector
        var sx = arr.sum
        var sxx = arr.map(x => BigInt(x) * x).sum
        val rs = Array.ofDim[Double](k)
        var ok = true
        for (r <- 1 to k if ok) {
          val n = arr.length
          val varnum = BigInt(n) * sxx - BigInt(sx) * sx
          if (varnum == 0) ok = false
          else {
            val maxdev = arr.map(x => (n * x - sx).abs).max
            // same double-op order as both engines
            rs(r - 1) = maxdev.toDouble / n.toDouble /
              math.sqrt(varnum.toDouble / (n * (n - 1)).toDouble)
            // first index on ties — the pinned removal rule
            val idx = arr.indexWhere(x => (n * x - sx).abs == maxdev)
            val rm = arr(idx)
            arr = arr.patch(idx, Nil, 1)
            sx -= rm
            sxx -= BigInt(rm) * rm
          }
        }
        if (!ok) None
        else {
          val nAnom = if (rs(2) > lam(2)) 3L else if (rs(1) > lam(1)) 2L
            else if (rs(0) > lam(0)) 1L else 0L
          Some((row.getString(0), row.getLong(1)) ->
            ((rs(0), rs(1), rs(2), nAnom)))
        }
      }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
    // masking resistance: the corpus must contain a window where the
    // SECOND round still fires (a single Grubbs pass would stop at 1)
    assert(got.values.exists(_._4 >= 2L),
      "expected a multi-outlier window at sf0.001")
  }

  test("a37 binseg == exact integer sequential recompute; both levels " +
    "split inside their segments") {
    // g1 computes in DECIMAL(38,0) internally (series-length-scaling
    // products would overflow int64) but leaves as DOUBLE — the exact
    // BigInt statistic cast to IEEE double is the pinned contract
    val got = Catalog.queries("a37_binseg")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    val wspec = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val series = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wspec))
      .select(col("event_type"), col("rn"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val expected = series.collect { case (tpe, vs) if vs.length >= 2 =>
      val n = vs.length.toLong
      val pre = vs.scanLeft(0L)(_ + _).tail // S_1..S_n
      val sn = pre.last
      // BigInt, mirroring the decimal products in the query
      def cusum(t: Int): BigInt = (BigInt(n) * pre(t - 1) - BigInt(t) * sn).abs
      val g1 = (1 until vs.length).map(cusum).max
      val t1 = (1 until vs.length).find(t => cusum(t) == g1).get.toLong
      val s1 = pre(t1.toInt - 1)
      def gLeft(t: Int): BigInt =
        (BigInt(t1) * pre(t - 1) - BigInt(t) * s1).abs
      def gRight(t: Int): BigInt =
        (BigInt(n - t1) * (pre(t - 1) - s1) -
          BigInt(t - t1) * (sn - s1)).abs
      val lts = (1 until t1.toInt)
      val rts = ((t1.toInt + 1) until vs.length)
      val t2l = if (lts.isEmpty) None else {
        val m = lts.map(gLeft).max; Some(lts.find(t => gLeft(t) == m).get.toLong)
      }
      val t2r = if (rts.isEmpty) None else {
        val m = rts.map(gRight).max; Some(rts.find(t => gRight(t) == m).get.toLong)
      }
      val den = BigInt(t1) * (n - t1)
      val shift = ((g1 + den / 2) / den).toDouble / 1e6
      tpe -> ((n, t1, g1.toDouble, shift, t2l, t2r))
    }
    assert(got === expected)
    got.foreach { case (tpe, (n, t1, _, shift, t2l, t2r)) =>
      assert(t1 >= 1 && t1 < n, s"$tpe level-1 split in range")
      t2l.foreach(t => assert(t < t1, s"$tpe left split inside segment"))
      t2r.foreach(t => assert(t > t1 && t < n,
        s"$tpe right split inside segment"))
      assert(shift >= 0.0)
    }
  }

  test("a38 MASE == exact integer sequential recompute; seasonal-naive " +
    "beats random-walk somewhere in the corpus") {
    val got = Catalog.queries("a38_mase")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val wspec = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val series = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wspec))
      .select(col("event_type"), col("rn"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val expected = series.flatMap { case (tpe, vs) =>
      val e1 = vs.indices.drop(1).map(i => BigInt((vs(i) - vs(i - 1)).abs))
      val es = vs.indices.drop(24).map(i => BigInt((vs(i) - vs(i - 24)).abs))
      val (sn, ss) = (e1.sum, es.sum)
      if (sn <= 0 || es.isEmpty) None
      else {
        def div(num: BigInt, den: BigInt): Double =
          ((num + den / 2) / den).toDouble
        val den = sn * es.length
        Some(tpe -> ((e1.length.toLong, es.length.toLong,
          div(sn * 1000000, e1.length) / 1e6 / 1e6,
          div(ss * 1000000, es.length) / 1e6 / 1e6,
          div(ss * e1.length * 1000000, den) / 1e6)))
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
    // the corpus has injected diurnal structure: at least one series
    // must be more seasonal-naive-predictable than random walk
    assert(got.values.exists(_._5 < 1.0),
      "expected a series with MASE < 1")
  }

  test("a39 seasonal ESD == sequential recompute (hour-of-day bucket " +
    "median, doubled residuals, 3 removal rounds); the bucket median " +
    "of the residuals is zero") {
    val got = Catalog.queries("a39_seasonal_esd")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))))
      .toMap
    val w = Anomaly.EsdWindow
    val k = Anomaly.EsdRounds
    val lam = Anomaly.EsdLambda
    val wspec = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val rows = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wspec))
      .select(col("event_type"), col("event_id"), col("rn"),
        hour(col("ts")).cast("long").as("hod"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    // doubled bucket median: interpolated percentile of ints is a
    // half-integer, so 2x it is the exact integer a + b of the middle
    // pair (or 2x the middle element)
    val med2: Map[(String, Long), Long] = rows.groupBy(t => (t._1, t._4))
      .view.mapValues { bucket =>
        val s = bucket.map(_._5).sorted
        val n = s.length
        if (n % 2 == 1) 2L * s(n / 2) else s(n / 2 - 1) + s(n / 2)
      }.toMap
    val expected = rows.groupBy(_._1).flatMap { case (tpe, ts) =>
      val ordered = ts.sortBy(_._3)
      val res2 = ordered.map(t => 2L * t._5 - med2((tpe, t._4)))
      ordered.indices.drop(w - 1).flatMap { i =>
        var arr = res2.slice(i - w + 1, i + 1).toVector
        var sx = arr.sum
        var sxx = arr.map(x => BigInt(x) * x).sum
        val rs = Array.ofDim[Double](k)
        var ok = true
        for (r <- 1 to k if ok) {
          val n = arr.length
          val varnum = BigInt(n) * sxx - BigInt(sx) * sx
          if (varnum == 0) ok = false
          else {
            val maxdev = arr.map(x => (n * x - sx).abs).max
            rs(r - 1) = maxdev.toDouble / n.toDouble /
              math.sqrt(varnum.toDouble / (n * (n - 1)).toDouble)
            val idx = arr.indexWhere(x => (n * x - sx).abs == maxdev)
            val rm = arr(idx)
            arr = arr.patch(idx, Nil, 1)
            sx -= rm
            sxx -= BigInt(rm) * rm
          }
        }
        if (!ok) None
        else {
          val nAnom = if (rs(2) > lam(2)) 3L else if (rs(1) > lam(1)) 2L
            else if (rs(0) > lam(0)) 1L else 0L
          Some((tpe, ordered(i)._2) ->
            ((res2(i).toDouble / 2000000.0, rs(0), rs(1), rs(2), nAnom)))
        }
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
    // the seasonal median centers every bucket: per (series, hod) the
    // median of the doubled residuals is exactly zero
    rows.groupBy(t => (t._1, t._4)).foreach { case (key, bucket) =>
      val r = bucket.map(t => 2L * t._5 - med2(key)).sorted
      val n = r.length
      val m2 = if (n % 2 == 1) 2L * r(n / 2) else r(n / 2 - 1) + r(n / 2)
      assert(m2 === 0L, s"bucket $key residual median")
    }
  }

  test("a40 spectral concentration == exact BigInt + pinned-order " +
    "double recompute; share/PR stay in their analytic bounds") {
    val got = Catalog.queries("a40_spectral_concentration")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val cos6 = Anomaly.Cos6; val sin6 = Anomaly.Sin6
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).flatMap { case (tpe, ts) =>
      val es = (1 to 12).map { k =>
        val sc = ts.map(t => BigInt(t._3) *
          cos6(((k * t._2) % 24).toInt)).sum
        val ss = ts.map(t => BigInt(t._3) *
          sin6(((k * t._2) % 24).toInt)).sum
        sc.toDouble * sc.toDouble + ss.toDouble * ss.toDouble
      }
      val etot = es.foldLeft(0.0)(_ + _)
      if (etot <= 0.0) None
      else {
        val esq = es.foldLeft(0.0)((a, x) => a + x * x)
        val emax = es.max
        val domK = (es.indexWhere(_ == emax) + 1).toLong
        Some(tpe -> ((ts.length.toLong, domK,
          rnd6(emax / etot), rnd6(etot * etot / esq))))
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
    got.values.foreach { case (_, k, share, pr) =>
      assert(k >= 1L && k <= 12L)
      assert(share > 0.0 && share <= 1.0)
      assert(pr >= 1.0 - 1e-9 && pr <= 12.0 + 1e-9)
    }
    // non-degenerate spectra: every series keeps some concentration
    // structure (PR strictly below the flat-spectrum maximum), and the
    // dominant share is consistent with PR's bound share >= 1/PR is
    // impossible to violate only when both derive from the same
    // energies — which the exact-equality pin above already forces
    assert(got.values.forall(_._4 < 12.0), "flat spectrum")
    got.values.foreach { case (_, _, share, pr) =>
      assert(share * pr >= 1.0 - 1e-6,
        s"share $share inconsistent with PR $pr")
    }
  }

  test("a41 rollup-then-detect == kernel ensemble on the sequentially " +
    "rolled-up hourly mean series") {
    val conf = AnomalyzerConf(
      activeSize = spec.activeSize, nSeasons = spec.nSeasons,
      upperBound = spec.upperBound, lowerBound = spec.lowerBound,
      sensitivity = spec.sensitivity,
      methods = Seq("magnitude", "fence", "cdf"))
    val got = Catalog.queries("a41_rollup_detect")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("long").as("tsec"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (tpe, rows) =>
      // the rollup, sequentially: exact integer micro-sum / count / 1e6
      // in the engines' shared op order
      val hourly = rows.groupBy(t => t._2 - Math.floorMod(t._2, 3600L))
        .toSeq.map { case (h, rs) =>
          (h, rs.map(_._3).sum.toDouble / rs.length / 1e6)
        }.sortBy(_._1)
      hourly.indices.drop(wSize - 1).map { i =>
        val arr = hourly.slice(i - wSize + 1, i + 1).map(_._2).toArray
        // per-test kernel probs, then the QUERY's exact-integer micro
        // weighted mean (probs rounded to 1e-6 BEFORE weighting — the
        // fused expression's arithmetic, which differs from the
        // full-precision kernel combine by 1 ulp of 1e-6 on boundary
        // rows)
        val pm = Ensemble.evalByTest(arr, conf, new graft.kernel.PermDraw(0L, 0L))
        val pm6 = Math.round(pm("magnitude") * 1e6)
        val pf6 = Math.round(pm("fence") * 1e6)
        val pc6 = Math.round(pm("cdf") * 1e6)
        val wm = if (pm6 > 800000L) 10L else 1L
        val wf = if (pf6 > 800000L) 10L else 1L
        val pe = if (pm6 < Math.round(conf.sensitivity * 1e6)) 0.0
          else Math.floor((2L * (wm * pm6 + wf * pf6 + pc6) +
            (wm + wf + 1L)) / (2.0 * (wm + wf + 1L))) / 1e6
        (tpe, hourly(i)._1) -> ((hourly(i)._2, pe))
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
  }

  /** (event_type) -> sorted micro-int values, the a42/a43 ground truth. */
  private lazy val microByType: Map[String, Array[Long]] =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("cast(round(value * 1e6) as bigint)").as("m"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }

  test("a42 sketch quantile: bucket edges bracket the exact order " +
    "statistic (the <=2x relative-error contract); sketch counts merge " +
    "across disjoint halves") {
    val out = Catalog.queries("a42_sketch_quantile")(spark, sfDir).collect()
    assert(out.length === microByType.size * Anomaly.SketchQs.size)
    out.foreach { r =>
      val (et, q, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (bkt, lo, hi) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val xs = microByType(et)
      assert(n === xs.length.toLong, s"$et n")
      val rank = ((n * q + 99) / 100).toInt // ceil(nq/100), ints exact
      val exact = xs(rank - 1)
      if (bkt > 0) {
        assert(lo <= exact && exact <= hi,
          s"$et q$q: exact $exact outside sketch bracket [$lo, $hi]")
        assert(hi === 2 * lo - 1, s"$et q$q: gamma=2 bucket edges")
      } else assert(exact <= 0, s"$et q$q: zero bucket only for <=0")
      assert(r.getDouble(6) === lo / 1e6, s"$et q$q: est is the lower edge")
    }
    // mergeability: bucket counts over two disjoint halves (split by
    // event_id parity — an arbitrary partition) ADD to the full sketch,
    // i.e. the sketch state is count-mergeable with no rescan
    def sketch(f: org.apache.spark.sql.DataFrame) = f
      .select(col("event_type"),
        expr("cast(round(value * 1e6) as bigint)").as("micro"))
      .withColumn("bkt", when(col("micro") <= 0L, lit(0))
        .otherwise(length(bin(col("micro")))))
      .groupBy("event_type", "bkt").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val ev = Tables.events(spark, sfDir)
    val full = sketch(ev)
    val a = sketch(ev.filter(col("event_id") % 2 === 0))
    val b = sketch(ev.filter(col("event_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === full, "half-sketches must add to the full sketch")
  }

  test("a43 EVT tail == sequential method-of-moments recompute, " +
    "exactly; GPD invariants hold") {
    val out = Catalog.queries("a43_evt_tail")(spark, sfDir).collect()
    assert(out.length === microByType.size)
    out.foreach { r =>
      val et = r.getString(0)
      val xs = microByType(et)
      val n = xs.length
      // exact integer sums -> the doubles are fold-order-independent
      val s1 = xs.sum
      val s2 = xs.map(x => BigInt(x) * BigInt(x)).sum
      val mean = s1.toDouble / n
      val varS = ((s2.toDouble / n - mean * mean) * n) / (n - 1)
      val uMicro = Math.round(mean + math.sqrt(varS))
      val ys = xs.filter(_ > uMicro).map(_ - uMicro)
      val k = ys.length
      assert(r.getLong(1) === n.toLong, s"$et n")
      assert(r.getDouble(2) === rnd6(uMicro / 1e6), s"$et u")
      assert(r.getLong(3) === k.toLong, s"$et n_exc")
      assert(r.getDouble(4) === rnd6(k.toDouble / n), s"$et tail_frac")
      assert(k >= 2, s"$et: mean+std threshold must leave exceedances")
      val e1 = ys.sum
      val e2 = ys.map(y => BigInt(y) * BigInt(y)).sum
      val meanE = e1.toDouble / k
      val varE = e2.toDouble / k - meanE * meanE
      assert(r.getDouble(5) === rnd6(meanE / 1e6), s"$et mean_exc")
      val ratio = meanE * meanE / varE
      assert(r.getDouble(6) === rnd6(0.5 * (1.0 - ratio)), s"$et xi")
      assert(r.getDouble(7) === rnd6(0.5 * (meanE / 1e6) * (1.0 + ratio)),
        s"$et sigma")
      // method-of-moments invariants: xi < 1/2 by construction, sigma
      // > 0, and the implied return level is monotone in the period
      val (xi, sg) = (r.getDouble(6), r.getDouble(7))
      assert(xi < 0.5 && sg > 0.0, s"$et GPD params out of range")
      val u = r.getDouble(2)
      val zs = Seq(2.0, 10.0, 100.0).map { mult =>
        // POT return level for exceedance prob (k/n)/mult
        if (math.abs(xi) < 1e-12) u + sg * math.log(mult)
        else u + sg / xi * (math.pow(mult, xi) - 1.0)
      }
      assert(zs === zs.sorted, s"$et return levels must be monotone")
      assert(zs.head > u, s"$et return level must exceed the threshold")
    }
  }

  test("a44 distribution drift == exact sequential TV recompute over " +
    "the half-split sketches; TV bounded in [0,1]") {
    val out = Catalog.queries("a44_dist_drift")(spark, sfDir).collect()
    // ordered micro stream per series, the query's (ts, event_id) order
    val streams: Map[String, Array[Long]] = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("event_id"),
        expr("cast(round(value * 1e6) as bigint)").as("m"))
      .orderBy(col("ts"), col("event_id"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(3)) }
    assert(out.length === streams.size)
    def bkt(m: Long): Int =
      if (m <= 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m)
    out.foreach { r =>
      val et = r.getString(0)
      val xs = streams(et)
      val n1 = xs.length / 2
      val (first, second) = xs.splitAt(n1)
      val n2 = second.length
      assert(r.getLong(1) === n1.toLong && r.getLong(2) === n2.toLong)
      val c1 = first.groupBy(bkt).map { case (b, v) => b -> v.length.toLong }
      val c2 = second.groupBy(bkt).map { case (b, v) => b -> v.length.toLong }
      val nums = (c1.keySet ++ c2.keySet).toSeq.sorted.map { b =>
        b -> (c1.getOrElse(b, 0L) * n2 - c2.getOrElse(b, 0L) * n1)
      }
      val tvNum = nums.map { case (_, d) => math.abs(d) }.sum
      assert(r.getLong(3) === tvNum, s"$et tv_num")
      assert(r.getDouble(4) === tvNum / (2.0 * n1 * n2), s"$et tv")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"$et range")
      val (topB, topD) = nums.maxBy { case (b, d) => (math.abs(d), -b) }
      assert(r.getLong(5) === topB.toLong, s"$et drift_bucket")
      assert(r.getLong(6) === -topD, s"$et drift_num (second minus first)")
    }
  }

  test("a45 incident correlation == exact recompute from a41's scored " +
    "hours; jaccard/lift are the HALF_UP micro-divisions") {
    val scored = Catalog.queries("a41_rollup_detect")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    val flagOf = scored.map { case (t, h, p) =>
      (t, h) -> (if (p > Anomaly.IncidentThreshold) 1L else 0L)
    }.toMap
    val hoursOf = scored.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).toSet
    }
    val out = Catalog.queries("a45_incident_corr")(spark, sfDir).collect()
    val types = hoursOf.keySet.toSeq.sorted
    assert(out.length === types.size * (types.size - 1) / 2)
    def micro(num: Long, den: Long): Double =
      if (den <= 0) 0.0 else ((num * 1000000L + den / 2) / den) / 1e6
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val shared = (hoursOf(a) intersect hoursOf(b)).toSeq
      val na = shared.count(h => flagOf((a, h)) == 1L).toLong
      val nb = shared.count(h => flagOf((b, h)) == 1L).toLong
      val both = shared.count(h =>
        flagOf((a, h)) == 1L && flagOf((b, h)) == 1L).toLong
      assert(r.getLong(2) === shared.size.toLong, s"$a/$b n_hours")
      assert(r.getLong(3) === na && r.getLong(4) === nb, s"$a/$b counts")
      assert(r.getLong(5) === both, s"$a/$b n_both")
      assert(r.getDouble(6) === micro(both, na + nb - both), s"$a/$b j")
      assert(r.getDouble(7) ===
        micro(both * shared.size, na * nb), s"$a/$b lift")
    }
    // the corpus must exercise real co-occurrence, not all-zero pairs
    assert(out.exists(_.getLong(5) > 0L), "expected co-occurring alerts")
  }

  test("a46 alert episodes == sequential islands recompute from a41's " +
    "scored hours; multi-hour episodes exist") {
    val flagged = Catalog.queries("a41_rollup_detect")(spark, sfDir)
      .collect()
      .filter(_.getDouble(3) > Anomaly.IncidentThreshold)
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    val out = Catalog.queries("a46_alert_episodes")(spark, sfDir)
      .collect()
    assert(out.length === flagged.size)
    out.foreach { r =>
      val et = r.getString(0)
      val hours = flagged(et)
      // sequential episode split: break when the gap exceeds one hour
      val episodes = hours.foldLeft(List.empty[List[Long]]) {
        case (acc, h) => acc match {
          case cur :: rest if cur.head + 3600L == h =>
            (h :: cur) :: rest
          case _ => List(h) :: acc
        }
      }.map(e => (e.length.toLong, e.min))
      assert(r.getLong(1) === hours.length.toLong, s"$et n_flagged")
      assert(r.getLong(2) === episodes.size.toLong, s"$et n_episodes")
      val meanWant =
        ((hours.length.toLong * 1000000L + episodes.size / 2) /
          episodes.size) / 1e6
      assert(r.getDouble(3) === meanWant, s"$et mean_len")
      assert(r.getLong(4) === episodes.map(_._1).max, s"$et max_len")
      val longest = episodes.minBy { case (len, start) => (-len, start) }
      assert(r.getLong(5) === longest._2, s"$et longest_start")
    }
    assert(out.exists(_.getLong(4) > 1L), "expected multi-hour episodes")
  }

  test("a47 quantile trend == sequential per-day and merged-7d sketch " +
    "recompute; estimates bracket the exact trailing p95") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_trunc("DAY", col("ts")).cast("long").as("d"),
        expr("cast(round(value * 1e6) as bigint)").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def bkt(m: Long): Int =
      if (m <= 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m)
    def sketchP95(ms: Seq[Long]): (Long, Long) = {
      // (n, p95 lower-edge micro) by a42's extraction rule
      val counts = ms.groupBy(bkt).map { case (b, v) =>
        b -> v.size.toLong
      }.toSeq.sortBy(_._1)
      val n = ms.size.toLong
      val rank = (n * 95L + 99L) / 100L
      var cum = 0L
      var hit = -1
      counts.foreach { case (b, c) =>
        cum += c; if (hit < 0 && cum >= rank) hit = b
      }
      (n, if (hit == 0) 0L else 1L << (hit - 1))
    }
    val byDay = rows.groupBy(r => (r._1, r._2))
    val out = Catalog.queries("a47_quantile_trend")(spark, sfDir)
      .collect()
    assert(out.length === byDay.size)
    out.foreach { r =>
      val (et, d) = (r.getString(0), r.getLong(1))
      val dayMs = byDay((et, d)).map(_._3).toSeq
      val (nDay, pDay) = sketchP95(dayMs)
      assert(r.getLong(2) === nDay, s"$et/$d n_day")
      assert(r.getDouble(3) === pDay / 1e6, s"$et/$d p95_day")
      val weekMs = rows.filter(x =>
        x._1 == et && x._2 <= d && x._2 >= d - 6L * 86400L).map(_._3)
      val (n7, p7) = sketchP95(weekMs.toSeq)
      assert(r.getLong(4) === n7, s"$et/$d n_7d")
      assert(r.getDouble(5) === p7 / 1e6, s"$et/$d p95_7d")
      // bracket contract on the merged sketch: lower edge <= exact
      // trailing p95 <= upper edge (gamma=2)
      val sorted = weekMs.sorted
      val exact = sorted(((n7 * 95L + 99L) / 100L - 1L).toInt)
      if (p7 > 0L)
        assert(p7 <= exact && exact <= 2L * p7 - 1L,
          s"$et/$d exact $exact outside [${p7}, ${2 * p7 - 1}]")
    }
  }

  test("a48 SLO burn == sequential multiwindow recompute from a41's " +
    "scored hours; paging requires BOTH windows over budget") {
    val scored = Catalog.queries("a41_rollup_detect")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(3) > Anomaly.IncidentThreshold))
    val byDay = scored.groupBy(r => (r._1, r._2 - (r._2 % 86400L)))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.count(_._3).toLong))
      }
    val out = Catalog.queries("a48_slo_burn")(spark, sfDir).collect()
    assert(out.length === byDay.size)
    val mult = 100L / Anomaly.SloBudgetPct
    out.foreach { r =>
      val (et, d) = (r.getString(0), r.getLong(1))
      def trailing(days: Long): (Long, Long) = {
        val win = byDay.filter { case ((t, dd), _) =>
          t == et && dd <= d && dd >= d - (days - 1) * 86400L
        }.values
        (win.map(_._2).sum, win.map(_._1).sum)
      }
      val (f1, h1) = trailing(1L)
      val (f7, h7) = trailing(7L)
      assert(r.getLong(2) === f1 && r.getLong(3) === h1, s"$et/$d 1d")
      assert(r.getLong(4) === f7 && r.getLong(5) === h7, s"$et/$d 7d")
      val b1 = ((f1 * 1000000L + h1 / 2) / h1) * mult
      val b7 = ((f7 * 1000000L + h7 / 2) / h7) * mult
      assert(r.getDouble(6) === b1 / 1e6, s"$et/$d burn_1d")
      assert(r.getDouble(7) === b7 / 1e6, s"$et/$d burn_7d")
      assert(r.getBoolean(8) === (b1 > 2000000L && b7 > 2000000L),
        s"$et/$d page")
    }
    // the policy's two sides must both occur on this corpus: pages,
    // and days where exactly one window is hot (suppressed)
    assert(out.exists(_.getBoolean(8)), "expected paging days")
    assert(out.exists(r => !r.getBoolean(8) &&
      (r.getDouble(6) > 2.0 || r.getDouble(7) > 2.0)),
      "expected days suppressed by the other window")
  }

  test("a49 two-sample KS == exact sequential recompute over every " +
    "series pair; D in (0, 1], argmax value pinned with smallest ties") {
    val out = Catalog.queries("a49_ks_two_series")(spark, sfDir)
      .collect()
    val vals = microByType // sorted micro values per series
    val types = vals.keySet.toSeq.sorted
    assert(out.length === types.size * (types.size - 1) / 2)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (xa, xb) = (vals(a), vals(b))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      val grid = (xa ++ xb).distinct.sorted
      def cle(xs: Array[Long], v: Long): Long =
        xs.count(_ <= v).toLong // xs sorted; fine at test scale
      val gaps = grid.map(v =>
        v -> math.abs(cle(xa, v) * nb - cle(xb, v) * na))
      val dNum = gaps.map(_._2).max
      val ksAt = gaps.filter(_._2 == dNum).map(_._1).min
      assert(r.getLong(2) === na && r.getLong(3) === nb, s"$a/$b n")
      assert(r.getLong(4) === dNum, s"$a/$b d_num")
      assert(r.getDouble(5) === dNum / (1.0 * na * nb), s"$a/$b d")
      assert(r.getLong(6) === ksAt, s"$a/$b ks_at_micro")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, s"$a/$b range")
    }
  }

  test("a50 STL decomposition == sequential median recompute; " +
    "the decomposition identity holds on every row") {
    val half = 12
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"),
        sum(expr("cast(round(value * 1e6) as bigint)")).as("s6"))
      .select(col("event_type"), col("h").cast("long").as("hid"),
        expr("(s6 + c div 2) div c").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(x => (x._2, x._3))
      }
    val out = Catalog.queries("a50_stl_decompose")(spark, sfDir)
      .collect()
    val expected = hourly.flatMap { case (t, series) =>
      val n = series.length
      val interior = (half until (n - half)).map { i =>
        val window = series.slice(i - half, i + half + 1).map(_._2)
        val trend = window.sorted.apply(half) // odd window: exact pick
        (t, series(i)._1, series(i)._2, trend)
      }
      val byHod = interior.groupBy { case (_, hid, _, _) =>
        (hid / 3600) % 24
      }
      val s2Of = byHod.map { case (hod, rs) =>
        val ds = rs.map { case (_, _, w, tr) => w - tr }.sorted
        val s2 =
          if (ds.length % 2 == 1) 2L * ds(ds.length / 2)
          else ds(ds.length / 2 - 1) + ds(ds.length / 2)
        hod -> s2
      }
      interior.map { case (tt, hid, w, tr) =>
        val d = w - tr
        val s2 = s2Of((hid / 3600) % 24)
        (tt, hid) -> ((w / 1e6, tr / 1e6, s2 / 2e6, (2L * d - s2) / 2e6))
      }
    }
    val got = out.map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"row $k")
    }
    // the decomposition identity (up to the /1e6 display rounding:
    // the INTEGER identity 2w = 2·trend + s2 + (2d − s2) is exact by
    // construction, the emitted doubles re-divide by non-dyadic 1e6)
    out.foreach { r =>
      val gap = r.getDouble(2) -
        (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))
      assert(math.abs(gap) < 1e-9,
        s"identity at ${(r.getString(0), r.getLong(1))}: $gap")
    }
  }

  test("a51 forecast band == sequential recompute; the 90% band flags " +
    "roughly a tenth of the hours") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"),
        sum(expr("cast(round(value * 1e6) as bigint)")).as("s6"))
      .select(col("event_type"), col("h").cast("long").as("hid"),
        expr("(s6 + c div 2) div c").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(x => (x._2, x._3))
      }
    val out = Catalog.queries("a51_forecast_band")(spark, sfDir)
      .collect()
    val expected = hourly.flatMap { case (t, series) =>
      val rows = series.indices.drop(24).map { i =>
        val fc = series(i - 24)._2
        (series(i)._1, series(i)._2, fc, series(i)._2 - fc)
      }
      val rs = rows.map(_._4).sorted
      val n = rs.length
      val q05 = rs(((n * 5 + 99) / 100 - 1).toInt)
      val q95 = rs(((n * 95 + 99) / 100 - 1).toInt)
      rows.map { case (hid, w, fc, _) =>
        (t, hid) -> ((w / 1e6, fc / 1e6, (fc + q05) / 1e6,
          (fc + q95) / 1e6, w < fc + q05 || w > fc + q95))
      }
    }
    val got = out.map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6)))).toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"row $k")
    }
    val flagFrac =
      out.count(_.getBoolean(6)).toDouble / out.length
    assert(flagFrac > 0.04 && flagFrac < 0.16,
      s"a [q05, q95] band should flag ~10% of hours, got $flagFrac")
  }

  test("a52/a53 matrix profile == exact int64 sequential recompute; " +
    "discord maximizes, motif minimizes the same pair distances") {
    val (w, stride, hor) = (Anomaly.MpW, Anomaly.MpStride, Anomaly.MpHorizon)
    def fix6(v: Double): Long =
      JBigDecimal.valueOf(v * 1e6)
        .setScale(0, RoundingMode.HALF_UP).longValueExact()
    // series order (ts, event_id) comes from the engine's sort; the
    // profile math below is all sequential Scala
    val wo = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val series = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wo))
      .select("event_type", "rn", "value").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.sortBy(_._2).map(x => fix6(x._3)) }
    case class Win(pos: Long, arr: Array[Long], sa: Long)
    val discords = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Double)]
    val motifs = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Double)]
    series.foreach { case (t, v6) =>
      val wins = (0 to v6.length - w by stride).map { p =>
        val a = v6.slice(p, p + w)
        Win(p.toLong, a, a.sum) }
      def d1(a: Win, b: Win): Long =
        (0 until w).map(i =>
          math.abs(w * (a.arr(i) - b.arr(i)) - (a.sa - b.sa))).sum
      val pairs = for {
        a <- wins; b <- wins
        if math.abs(a.pos - b.pos) >= w && math.abs(a.pos - b.pos) <= hor
      } yield (a, b, d1(a, b))
      val prof = pairs.groupBy(_._1.pos).map { case (pos, ps) =>
        val (_, nb, d) = ps.minBy { case (_, b, d) => (d, b.pos) }
        (pos, nb.pos, d) }.toSeq
      prof.sortBy { case (pos, _, d) => (-d, pos) }.take(3).zipWithIndex
        .foreach { case ((pos, npos, d), i) =>
          discords += ((t, (i + 1).toLong, pos, npos, d,
            rnd6(d.toDouble / (w.toDouble * w * 1e6)))) }
      pairs.filter { case (a, b, _) => a.pos < b.pos }
        .sortBy { case (a, b, d) => (d, a.pos, b.pos) }.take(3).zipWithIndex
        .foreach { case ((a, b, d), i) =>
          motifs += ((t, (i + 1).toLong, a.pos, b.pos, d,
            rnd6(d.toDouble / (w.toDouble * w * 1e6)))) }
    }
    val gotD = Catalog.queries("a52_discord_profile")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq.sorted
    val gotM = Catalog.queries("a53_motif_pairs")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq.sorted
    assert(gotD === discords.toSeq.sorted)
    assert(gotM === motifs.toSeq.sorted)
    // a discord's profile dominates every motif distance in its series
    val motifMax = motifs.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._5).max }
    discords.foreach { case (t, _, _, _, prof, _) =>
      assert(prof >= motifMax(t),
        s"$t: discord profile $prof below a motif distance") }
  }

  test("a54 detector scorecard == sequential recompute; truth budget " +
    "and metric identities hold") {
    def micro(x: Double): Long =
      JBigDecimal.valueOf(x * 1000000.0)
        .setScale(0, RoundingMode.HALF_UP).longValue
    val raw = Tables.events(spark, sfDir)
      .select("event_type", "event_id", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getDouble(3)))
    val want = raw.groupBy(_._1).toSeq.flatMap { case (et, xs0) =>
      val xs = xs0.sortBy(x => (x._3, x._2))
      // scoreable universe: full 25-windows
      case class U(eid: Long, ts: Long, v: Double, med25: Double,
        mad25: Double, q1: Double, q3: Double)
      val universe = (24 until xs.length).map { i =>
        val arr = (i - 24 to i).map(xs(_)._4).toArray
        val sarr = arr.sorted
        val med = sarr(12)
        U(xs(i)._2, xs(i)._3, xs(i)._4, med,
          arr.map(x => math.abs(x - med)).sorted.apply(12), sarr(6),
          sarr(18))
      }
      val nu = universe.length
      val gm = universe.sortBy(u => (u.v, u.ts, u.eid))
        .apply((nu + 1) / 2 - 1).v
      val truth = universe
        .sortBy(u => (-math.abs(u.v - gm), u.ts, u.eid)).take(20)
        .map(_.eid).toSet
      val s1 = universe.map(u => micro(u.v)).sum
      val s2 = universe.map(u => BigInt(micro(u.v)) * micro(u.v)).sum
      val gate = 3.0 * math.sqrt((BigInt(nu) * s2 - BigInt(s1) * s1)
        .toDouble)
      def score(det: String, flag: U => Boolean) = {
        val tp = universe.count(u => flag(u) && truth(u.eid)).toLong
        val fp = universe.count(u => flag(u) && !truth(u.eid)).toLong
        val fn = universe.count(u => !flag(u) && truth(u.eid)).toLong
        (et, det, tp, fp, fn,
          if (tp + fp > 0) Some(rnd6(tp.toDouble / (tp + fp))) else None,
          rnd6(tp.toDouble / (tp + fn)),
          rnd6(2.0 * tp / (2 * tp + fp + fn)))
      }
      Seq(
        score("iqr", u => u.v < u.q1 - 1.5 * (u.q3 - u.q1) ||
          u.v > u.q3 + 1.5 * (u.q3 - u.q1)),
        score("mad", u => if (u.mad25 == 0.0) u.v != u.med25
          else math.abs(0.6745 * (u.v - u.med25) / u.mad25) > 3.5),
        score("zscore",
          u => math.abs((nu * micro(u.v) - s1).toDouble) > gate))
    }.sorted
    val got = Catalog.queries("a54_detector_scorecard")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6), r.getDouble(7))).toSeq.sorted
    assert(got === want)
    // every (series, detector) row spends exactly the 20-row truth
    // budget, and F1 sits between min(P, R) and max(P, R)
    got.foreach { case (et, det, tp, _, fn, p, rec, f1) =>
      assert(tp + fn === 20L, s"$et/$det truth budget violated")
      p.foreach { pv =>
        assert(f1 >= math.min(pv, rec) - 1e-6 &&
          f1 <= math.max(pv, rec) + 1e-6, s"$et/$det F1 outside [P,R]")
      }
    }
    assert(got.map(_._2).distinct.sorted === Seq("iqr", "mad", "zscore"))
  }

  test("a55 detector overlap == recompute from the shared flag frame; " +
    "Jaccard bounds and flag-count consistency with a54 hold") {
    val flags = Anomaly.scorecardFlags(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4)))
    val want = flags.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      def pair(da: String, db: String, fa: ((String, Boolean, Boolean,
        Boolean)) => Boolean, fb: ((String, Boolean, Boolean,
        Boolean)) => Boolean) = {
        val na = xs.count(fa).toLong
        val nb = xs.count(fb).toLong
        val both = xs.count(x => fa(x) && fb(x)).toLong
        val either = xs.count(x => fa(x) || fb(x)).toLong
        (et, da, db, na, nb, both,
          if (either > 0) Some(rnd6(both.toDouble / either)) else None)
      }
      Seq(pair("iqr", "mad", _._2, _._3), pair("iqr", "zscore", _._2, _._4),
        pair("mad", "zscore", _._3, _._4))
    }.sorted
    val got = Catalog.queries("a55_detector_overlap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSeq.sorted
    assert(got === want)
    // overlap can never exceed either flag set; Jaccard in [0, 1];
    // per-detector flag totals agree with a54's tp+fp
    val a54 = Catalog.queries("a54_detector_scorecard")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2) + r.getLong(3))).toMap
    got.foreach { case (et, da, db, na, nb, both, j) =>
      assert(both <= math.min(na, nb))
      j.foreach(v => assert(v >= 0.0 && v <= 1.0))
      assert(na === a54((et, da)), s"$et/$da flag count drifted from a54")
      assert(nb === a54((et, db)), s"$et/$db flag count drifted from a54")
    }
  }

  test("a56 z-gate sweep == recompute from the shared flag frame; " +
    "flags/recall non-increasing in the gate; t=3 row == a54 zscore") {
    val gates = Seq(2.0, 2.5, 3.0, 3.5, 4.0)
    val frame = Anomaly.scorecardFlags(spark, sfDir)
      .select("event_type", "is_true", "z_abs", "z_sig").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getDouble(2),
        r.getDouble(3)))
    val want = frame.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      gates.map { g =>
        val fl = xs.map(x => (x._3 > g * x._4, x._2))
        val tp = fl.count(x => x._1 && x._2).toLong
        val fp = fl.count(x => x._1 && !x._2).toLong
        val fn = fl.count(x => !x._1 && x._2).toLong
        (et, g, (tp + fp), tp, fp, fn,
          if (tp + fp > 0) Some(rnd6(tp.toDouble / (tp + fp))) else None,
          rnd6(tp.toDouble / (tp + fn)),
          rnd6(2.0 * tp / (2 * tp + fp + fn)))
      }
    }.sorted
    val got = Catalog.queries("a56_zgate_sweep")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        r.getDouble(7), r.getDouble(8))).toSeq.sorted
    assert(got === want)
    // the sweep is a proper tuning curve: raising the gate can only
    // drop flags and recall, never add them
    got.groupBy(_._1).foreach { case (et, rows) =>
      val byGate = rows.sortBy(_._2)
      assert(byGate.map(_._3) === byGate.map(_._3).sorted.reverse,
        s"$et: n_flagged must be non-increasing in the gate")
      assert(byGate.map(_._8) === byGate.map(_._8).sorted.reverse,
        s"$et: recall must be non-increasing in the gate")
    }
    // internal consistency: the t=3 row is exactly a54's zscore row
    val a54z = Catalog.queries("a54_detector_scorecard")(spark, sfDir)
      .filter(col("detector") === "zscore").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    got.filter(_._2 == 3.0).foreach { case (et, _, _, tp, fp, fn, _, _, _) =>
      assert((tp, fp, fn) === a54z(et), s"$et: t=3 drifted from a54")
    }
  }

  test("a57 ensemble ablation == recompute from the shared flag frame; " +
    "removing a detector never increases ensemble recall") {
    val frame = Anomaly.scorecardFlags(spark, sfDir)
      .select("event_type", "is_true", "iqr_flag", "mad_flag", "z_flag")
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    val variants: Seq[(String, ((Boolean, Boolean, Boolean)) => Boolean)] =
      Seq(
        "0_all" -> (f => f._1 || f._2 || f._3),
        "1_no_iqr" -> (f => f._2 || f._3),
        "2_no_mad" -> (f => f._1 || f._3),
        "3_no_zscore" -> (f => f._1 || f._2))
    val want = frame.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      variants.map { case (v, fn0) =>
        val fl = xs.map(x => (fn0((x._3, x._4, x._5)), x._2))
        val tp = fl.count(x => x._1 && x._2).toLong
        val fp = fl.count(x => x._1 && !x._2).toLong
        val fnn = fl.count(x => !x._1 && x._2).toLong
        (et, v, tp, fp, fnn,
          if (tp + fp > 0) Some(rnd6(tp.toDouble / (tp + fp))) else None,
          rnd6(tp.toDouble / (tp + fnn)),
          rnd6(2.0 * tp / (2 * tp + fp + fnn)))
      }
    }.sorted
    val got = Catalog.queries("a57_ensemble_ablation")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6), r.getDouble(7))).toSeq.sorted
    assert(got === want)
    // OR-monotonicity: the full ensemble flags a superset of every
    // leave-one-out variant, so its tp (recall) dominates
    got.groupBy(_._1).foreach { case (et, rows) =>
      val full = rows.find(_._2 == "0_all").get
      rows.filter(_._2 != "0_all").foreach { r =>
        assert(r._3 <= full._3, s"$et/${r._2}: ablation cannot raise tp")
        assert(r._4 <= full._4, s"$et/${r._2}: ablation cannot raise fp")
      }
    }
  }

  test("a58 gate tuner picks per series the loosest swept gate meeting " +
    "the precision budget, from exact integer counts") {
    val sweep = Catalog.queries("a56_zgate_sweep")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val want = sweep.groupBy(_._1).toSeq.map { case (et, rows) =>
      val ok = rows.filter(r => 10 * r._3 >= 8 * (r._3 + r._4))
      if (ok.nonEmpty) {
        val pick = ok.minBy(_._2)
        (et, Some(pick._2), pick._3, pick._4, pick._5, true)
      } else {
        val base = rows.minBy(_._2)
        (et, None, base._3, base._4, base._5, false)
      }
    }.sorted
    val got = Catalog.queries("a58_gate_tuner")(spark, sfDir)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(7)))
      .toSeq.sorted
    assert(got === want)
    assert(got.size === sweep.map(_._1).distinct.length,
      "exactly one recommendation per series")
    got.filter(_._6).foreach { case (et, g, tp, fp, _, _) =>
      assert(g.nonEmpty && 10 * tp >= 8 * (tp + fp),
        s"$et: recommended gate must itself meet the budget")
    }
  }
}
