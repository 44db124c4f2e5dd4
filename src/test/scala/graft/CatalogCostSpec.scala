package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-cost regression guard. Round 6's driver correctness gate
  * came back EMPTY because two catalog entries (the chained-withColumn
  * ESD rounds) each took ~5 minutes at sf0.01 while every other query
  * finished in seconds — the gate hit its budget mid-run and scored
  * nothing. That class of bug must fail CI, not the driver gate: this
  * suite executes every catalog entry at sf0.001 and fails if any
  * single query costs more than max(20x the median, floor) — a
  * per-query runtime that far out of family is an accidental
  * complexity blowup (plan explosion, lost pushdown, driver-side
  * loop), not data volume.
  */
class CatalogCostSpec extends AnyFunSuite with SparkTestBase {

  test("no catalog entry is a runtime outlier at sf0.001 " +
    "(>20x median => plan-complexity regression)") {
    // untimed warm-up: the first query otherwise absorbs session
    // start, parquet footer reads, and codegen warm-up (~9 s) and
    // reads as a false outlier
    queries.Catalog.all.head.run(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    val times = queries.Catalog.all.map { e =>
      val t0 = System.nanoTime()
      e.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      e.name -> sec
    }
    val sorted = times.map(_._2).sorted
    val median = sorted(sorted.size / 2)
    // floor absorbs constant per-query overhead (session warm-up,
    // codegen) that dominates at sf0.001 and would make a tiny median
    // trip healthy queries
    val limit = math.max(20 * median, 8.0)
    info(f"catalog: ${times.size} queries, median $median%.2f s, " +
      f"limit $limit%.1f s, total ${sorted.sum}%.1f s")
    times.sortBy(-_._2).take(5).foreach { case (n, t) =>
      info(f"  slowest: $n%-28s $t%6.2f s")
    }
    // re-measure first-pass outliers (best of 2) before failing: under
    // sbt's parallel suite execution other Spark suites share the
    // session, and a co-scheduled heavy stage can push one measurement
    // over the limit; a GENUINE complexity blowup (the 300 s round-6
    // a36) reproduces on retry, a co-load artifact does not
    val outliers = times.filter(_._2 > limit).map { case (n, t0) =>
      val retried = (1 to 2).map { _ =>
        val t = System.nanoTime()
        queries.Catalog.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t) / 1e9
      }.min
      info(f"  retried outlier: $n%-28s first $t0%6.2f s -> $retried%6.2f s")
      n -> retried
    }.filter(_._2 > limit)
    assert(outliers.isEmpty,
      outliers.map { case (n, t) => f"$n ($t%.1f s)" }.mkString(
        f"catalog entries over $limit%.1f s at sf0.001 — the round-6 " +
          "gate-killer class: ", ", ", ""))
    // TOTAL-wall budget: the driver's Verify runs this catalog at
    // sf0.01 under a bounded gate; per-query guards don't stop slow
    // CREEP as the catalog grows (171 entries x a quietly-regressed
    // mean). Round-8 measured totals: ~190 s here (sf0.001, one
    // measurement per query, sbt suites co-scheduled on the shared
    // session) vs 171 s for the real sf0.01 Verify on 32 dedicated
    // CPUs — per-query fixed overhead dominates at this SF, so treat
    // this as a creep tripwire, not a precise Verify predictor.
    val total = sorted.sum
    assert(total < 300.0,
      f"catalog total at sf0.001 is $total%.1f s (budget 300 s; " +
        "round-8 measured ~190 s) — the catalog-wide cost crept up; " +
        "find the regressed entries before the driver's Verify gate " +
        "times out")
  }
}
