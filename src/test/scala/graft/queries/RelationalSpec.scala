package graft.queries

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

class RelationalSpec extends AnyFunSuite with SparkTestBase {

  test("q35 gaps-and-islands: runs are consecutive, maximal, and " +
    "exactly cover each user's distinct active days") {
    val islands = Catalog.queries("q35_gaps_islands")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDate(2).toLocalDate, r.getLong(3)))
    assert(islands.nonEmpty)
    // each island is a consecutive run
    islands.foreach { case (u, s, e, n) =>
      assert(n === ChronoUnit.DAYS.between(s, e) + 1,
        s"user $u island $s..$e has n_days $n")
    }
    // islands are maximal: per user, sorted runs are separated by a
    // gap of at least one missing day
    islands.groupBy(_._1).foreach { case (u, is) =>
      is.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(ChronoUnit.DAYS.between(e1, s2) >= 2,
            s"user $u islands $e1 and $s2 should have merged")
        case _ =>
      }
    }
    // islands expand back to exactly the user's distinct active days
    val active: Map[Long, Set[LocalDate]] = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val covered: Map[Long, Set[LocalDate]] = islands.groupBy(_._1)
      .view.mapValues(_.flatMap { case (_, s, e, _) =>
        Iterator.iterate(s)(_.plusDays(1))
          .takeWhile(!_.isAfter(e)).toSeq
      }.toSet).toMap
    assert(covered === active)
  }

  test("q36 recursive closure == sequential digit-prefix chain walk") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val got = Catalog.queries("q36_recursive")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val bal = Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) ->
        JBD.valueOf(r.getDouble(1)).setScale(2, RM.HALF_UP)).toMap
    val expected = bal.keys.map { k =>
      // node_0 = k, node_{i+1} = node_i / 10 while node_i >= 10,
      // then keep the chain nodes that are themselves customer keys
      // CTE semantics exactly: emit node, recurse while node >= 10 —
      // so a key < 10 (including 0) still yields its own one-node chain
      val nodes = k +: Iterator.iterate(k)(_ / 10)
        .takeWhile(_ >= 10).map(_ / 10).toSeq
      val chain = nodes.filter(bal.contains)
      k -> ((chain.size.toLong,
        chain.map(bal).reduce(_ add _).doubleValue()))
    }.toMap
    assert(got === expected)
    // every customer key's full digit-prefix set is present in this
    // corpus (keys are dense from 1), so chains have >1 node beyond
    // the single-digit roots — the recursion genuinely iterated
    assert(got.values.exists(_._1 > 1), "expected multi-node chains")
  }

  test("q37 TWAP == exact BigInt sequential recompute; constant-rate " +
    "series TWAP differs from the plain mean") {
    val got = Catalog.queries("q37_twap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("day"),
        unix_micros(col("ts")).as("us"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"),
        expr("cast(round(value * 1e6) as bigint)").as("v6"),
        col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = rows.groupBy(r => (r._1, r._2)).map { case (key, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._6)) // (us, event_id)
      var num = BigInt(0); var den = BigInt(0)
      ordered.zipWithIndex.foreach { case ((_, _, us, dayUs, v6, _), i) =>
        val nextUs = if (i + 1 < ordered.length) ordered(i + 1)._3
                     else dayUs + 86400000000L
        num += BigInt(v6) * (nextUs - us)
        den += BigInt(nextUs - us)
      }
      key -> (((num.toDouble / den.toDouble) / 1e6, ordered.length.toLong))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, (twap, n)) =>
      val (gt, gn) = got(key)
      assert(gt === twap, s"$key twap")
      assert(gn === n, s"$key n_events")
    }
    // durations genuinely vary, so TWAP must not collapse to the mean
    val plainMeans = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> rs.map(_._5).sum.toDouble / rs.length / 1e6
    }
    assert(expected.exists { case (k, (t, _)) =>
      math.abs(t - plainMeans(k)) > 1e-9
    }, "TWAP should differ from the unweighted mean somewhere")
  }

  test("q38 lateral top-2 == per-customer brute force; at most two " +
    "rows per customer; order-less customers absent") {
    val got = Catalog.queries("q38_lateral")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val orders = Tables.table(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = orders.view.mapValues(
      _.sortBy(t => (-t._3, t._2)).take(2).map(t => (t._2, t._3)).toSet)
      .toMap
    assert(got === expected)
    got.values.foreach(rs => assert(rs.size <= 2))
  }

  test("q39 division == brute-force full-coverage set") {
    val got = Catalog.queries("q39_division")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val byCust = Tables.table(spark, sfDir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val allYears = byCust.values.flatten.toSet
    val expected = byCust.filter(_._2 == allYears).map { case (c, ys) =>
      c -> ((ys.size.toLong, ys.min.toLong, ys.max.toLong))
    }
    assert(got === expected)
    assert(got.nonEmpty, "division should have qualifiers in this corpus")
  }

  test("q41 salted join == plain unsalted join, and the plan shuffles " +
    "on (key, salt)") {
    val got = Catalog.queries("q41_skew_salted_join")(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        expr("cast(round(value * 1e6) as bigint)").as("value_micro"))
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("type_cnt"), sum("value_micro").as("s6"))
    val plain = ev.join(dim, "event_type")
      .select(col("event_type"), col("event_id"), col("value_micro"),
        col("type_cnt"),
        round(col("value_micro") / col("s6"), 9).as("type_share"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(r =>
        (r(0).asInstanceOf[String], r(1).asInstanceOf[Long]))
    assert(rows(got) === rows(plain))
    assert(got.queryExecution.executedPlan.toString.contains("__salt"),
      "q41 must actually route through the salted join")
  }

  test("q42 SCD2 intervals: contiguous half-open chains per customer, " +
    "adjacent intervals change status, n_orders sums to order count") {
    // timestamps compared as opaque values (the corpus has shipped both
    // TIMESTAMP and TIMESTAMP_NTZ encodings — the chain logic is
    // type-agnostic)
    val got = Catalog.queries("q42_scd2_intervals")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.get(3), Option(r.get(4)), r.getLong(5), r.getBoolean(6)))
    val byCust = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    byCust.foreach { case (cust, segs) =>
      // islands number 1..k; exactly one open (current) interval, last
      assert(segs.map(_._2) === (1L to segs.length.toLong),
        s"cust $cust island numbering")
      segs.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._5.contains(b._4), s"cust $cust: valid_to must equal " +
          "the next interval's valid_from")
        assert(a._3 !== b._3, s"cust $cust: adjacent intervals must " +
          "differ in status")
      }
      assert(segs.init.forall(!_._7) && segs.last._7 && segs.last._5.isEmpty,
        s"cust $cust: exactly the last interval is current/open")
    }
    val orderCount = Tables.table(spark, sfDir, "orders").count()
    assert(got.map(_._6).sum === orderCount,
      "interval n_orders must partition the order set")
  }

  test("q43 funnel == per-user sequential recompute; order is " +
    "enforced, not just existence") {
    val got = Catalog.queries("q43_funnel")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      def firstAfter(tpe: String, after: Long): Option[Long] = {
        val ts = evs.collect { case (_, t, s) if t == tpe && s > after => s }
        if (ts.isEmpty) None else Some(ts.min)
      }
      firstAfter("view", Long.MinValue).map { tv =>
        val tc = firstAfter("click", tv)
        val tp = tc.flatMap(c => firstAfter("purchase", c))
        u -> ((Some(tv), tc, tp, tc.isDefined, tp.isDefined))
      }
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty && got.values.exists(_._5),
      "the corpus should contain full conversions")
    // the dense test corpus converts every clicker, so pin the ORDER
    // invariant instead of demanding partial funnels exist
    got.values.foreach { case (tv, tc, tp, _, _) =>
      tc.foreach(c => assert(c > tv.get, "click must follow the view"))
      tp.foreach(p => assert(p > tc.get, "purchase must follow the click"))
    }
  }

  test("q44 retention: offset-0 row is the full cohort by definition; " +
    "active never exceeds cohort; totals == sequential recompute") {
    val got = Catalog.queries("q44_retention")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    got.foreach { case ((cw, off), (active, size, rate)) =>
      assert(off >= 0, s"cohort $cw cannot be active before it exists")
      assert(active <= size, s"cohort $cw offset $off: active > cohort")
      if (off == 0) assert(active === size,
        s"cohort $cw: every member is active in their first week")
      assert(rate > 0.0 && rate <= 1.0)
    }
    val weeks = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("cast(to_unix_timestamp(ts) as bigint) div 604800").as("wk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohortOf = weeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = weeks.groupBy { case (u, w) => (cohortOf(u), w - cohortOf(u)) }
      .view.mapValues(_.length.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === expected)
  }

  test("q45 merge upsert: actions partition the keyspace, updates " +
    "carry the +7.00 correction, inserts are exactly the unmatched " +
    "delta, keeps are untouched") {
    val got = Catalog.queries("q45_merge_upsert")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4))))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap
    // output is integer cents (BIGINT) — money rounded HALF_UP at 2dp
    def cents(d: Double): Long =
      new java.math.BigDecimal(d).setScale(2,
        java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact
    // one output row per target key plus one per re-keyed insert
    val inserted = orders.keys.filter(_ % 97 == 0).map(_ + 9000000000L)
    assert(got.length === orders.size + inserted.size)
    val byKey = got.toMap
    assert(got.length === byKey.size, "merge output keys must be unique")
    orders.foreach { case (k, (ck, st, tp)) =>
      val (gck, gst, gtp, act) = byKey(k)
      assert(gck === ck)
      if (k % 10 == 3) {
        assert(act === "update")
        assert(gst === "U")
        assert(gtp === cents(tp) + 700L)
      } else {
        assert(act === "keep")
        assert(gst === st)
        assert(gtp === cents(tp))
      }
    }
    inserted.foreach { nk =>
      val (_, st, _, act) = byKey(nk)
      assert(act === "insert")
      assert(st === "N")
    }
  }

  test("q46 incremental aggregate == full recompute (the merge " +
    "algebra's defining property)") {
    val got = Catalog.queries("q46_incremental_agg")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val full = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        math.round(r.getDouble(2) * 100))
      .groupBy(_._1).view.mapValues(_.map(_._2))
    val expected = full.map { case (k, cents) =>
      val n = cents.size.toLong
      val q2 = cents.sum
      k -> ((n, q2 / 100.0,
        ((q2 * 10000 + n / 2) / n).toDouble / 1e6))
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q47 changed-partition detection: exactly the months carrying " +
    "a delta row flag as changed; counts reconcile") {
    val got = Catalog.queries("q47_partition_diff")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "date_format(o_orderdate, 'yyyy-MM') as m")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byMonth = orders.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nInserts = orders.count(_._1 % 97 == 0).toLong
    byMonth.foreach { case (m, keys) =>
      val (nb, nn, changed) = got(m)
      assert(nb === keys.length.toLong, s"$m base count")
      assert(nn === keys.length.toLong, s"$m next count (updates stay)")
      assert(changed === keys.exists(_ % 10 == 3),
        s"$m changed iff it carries an updated key")
    }
    val (ib, in_, ich) = got("2099-01")
    assert(ib === 0L && in_ === nInserts && ich === (nInserts > 0),
      "the synthetic insert month holds exactly the inserts")
    assert(got.size === byMonth.size + 1)
  }
}
