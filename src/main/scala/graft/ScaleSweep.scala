package graft

import java.io.{File, PrintWriter}

/** Multi-point scale regression gate: times each bench entry at
  * 1×/3×/10× replicated corpora (ScaleSmoke's replicator, sf0.1
  * base), fits the scaling exponent α in t ≈ c·nᵅ by least squares
  * over (log n, log t), and FAILS (exit 1) when α exceeds the entry's
  * pinned cap — turning the old one-point "at-or-below linear"
  * eyeball into a recorded, re-runnable artifact.
  *
  * `runMain graft.ScaleSweep [outJson] [name ...]` — defaults:
  * `SCALE_SWEEP.json` in the cwd, the full bench set. Each point is
  * the best of 2 timed runs after one warmup (the same discipline as
  * Bench), with entry caches + the SQL cache cleared between points so
  * no point rides another's state.
  *
  * Reading the fit: fixed per-query overhead (session, planning,
  * small-dim scans) deflates α below 1 for sub-second entries — a
  * SAFE bias for a gate that only fires on α ABOVE cap. Exact
  * replication gives every doc N−1 identical twins, so near-dup
  * PAIR OUTPUT grows ~N² by construction for the dedup families —
  * their caps encode that expectation (see [[Caps]]); the gate still
  * catches a dedup plan going accidentally all-pairs, because that
  * blows past even the quadratic-output cap via the candidate side.
  */
object ScaleSweep {

  private val Factors = Seq(1, 3, 10)

  /** The quadratic-output dedup entries get one more decade: under
    * exact replication their PAIR OUTPUT inflates ~N² by construction,
    * so a coarse 1×/3×/10× fit cannot separate "quadratic output"
    * (expected, bounded by df/occupancy caps) from "quadratic WORK"
    * (an accidental all-pairs plan). The 30× point adds the decade
    * that separates them: output-quadratic entries keep flattening as
    * the caps bite harder (more twins discarded per bucket), while a
    * work-quadratic plan keeps steepening toward α = 2.
    */
  private val DedupExtraFactor = 30

  /** Default fitted-exponent cap: linear plus measurement headroom.
    * Sub-second entries fit well below 1; anything genuinely linear
    * lands ≲1.1 even with noisy small-n points.
    */
  val DefaultCap = 1.30

  /** Per-entry caps above the default, each with the structural reason
    * the entry's work/output LEGITIMATELY grows faster than the corpus
    * under exact ×N replication (N−1 identical twins per doc):
    * near-dup pair OUTPUT is ~N² for the pair-emitting entries. These
    * are output-volume facts of the synthetic corpus, not plan
    * defects — a real corpus does not replicate every document.
    */
  val Caps: Map[String, Double] = Map(
    // emits (doc_a, doc_b) near-dup pairs: each base pair gains ~N²
    // twin combinations (bounded by the df/occupancy caps, which is
    // why the observed exponent sits well under 2)
    "p03_dedup_ngram_jaccard" -> 2.2,
    "p04_dedup_minhash_lsh" -> 2.2,
    // span excision joins contaminated spans against their duplicates:
    // span multiplicity is ~N² under replication
    "p44_dupspan" -> 2.2,
    // the two DECLARED brute-force baselines: the query set is a fixed
    // fraction of the corpus (vec_id % 50), so queries AND corpus both
    // grow ×N and the exact scan does ~N² work BY DECLARATION — their
    // scale paths (p15/p63) are swept separately under the linear cap.
    // Under 1.3 they passed only via fixed-overhead deflation (r11
    // fits: p07 1.03, p59 1.28 — one noisy point from a false alarm)
    "p07_sim_topk" -> 2.2,
    "p59_pq_topk" -> 2.2,
    // (p100_ivfpq_recall's exact arm is the same declared p07-class
    // brute baseline, but p100 is an evaluation-time monitor, not a
    // bench entry, so it is not in the default sweep list — add it
    // here with 2.2 if it ever joins the sweep)
    // ---- the budget-top tier added in r12 (VERDICT r11 #7): entries
    // whose work rides the p04 LSH PAIR LIST (components, calibration,
    // splits, leakage audit, per-pair runs) — pair count inflates ~N²
    // under exact replication exactly like p04 itself, bounded by the
    // same df/occupancy caps
    "p23_dedup_clusters" -> 2.2,
    "p54_minhash_calibration" -> 2.2,
    "p66_split_leakfree" -> 2.2,
    "p67_leakage_audit" -> 2.2,
    "p71_split_contamination" -> 2.2,
    "p87_longest_common_run" -> 2.2,
    // retrieval with a fixed-corpus-fraction query set (doc_id % 100):
    // queries AND postings both grow ×N, so the (query, doc) score
    // volume is ~N² BY DECLARATION (the p07/p59 rationale; a real
    // deployment's query set does not grow with the corpus)
    "p58_bm25_topk" -> 2.2,
    "p60_hybrid_rrf" -> 2.2
  )

  /** Entries that also time a 30× point (see [[DedupExtraFactor]]):
    * kept to the five original quadratic-output dedup entries — the
    * r12 budget-tier additions share their caps but not the extra
    * decade (the 30× corpus puts minutes-long component/calibration
    * runs in the sweep for no extra separation: their quadratic term
    * is the SAME pair list the p04 point already separates).
    */
  private val ExtraFactorNames = Set("p03_dedup_ngram_jaccard",
    "p04_dedup_minhash_lsh", "p44_dupspan", "p07_sim_topk", "p59_pq_topk")

  /** The non-bench entries swept anyway (VERDICT r11 #7): the top of
    * the Verify budget table, whose 100× behavior the bench-set sweep
    * never fitted.
    */
  val ExtraSweepNames: Seq[String] = Seq("p23_dedup_clusters",
    "p54_minhash_calibration", "p58_bm25_topk", "p60_hybrid_rrf",
    "p66_split_leakfree", "p67_leakage_audit", "p71_split_contamination",
    "p87_longest_common_run")

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SCALE_SWEEP.json")
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else queries.Catalog.benchNames ++
        ExtraSweepNames.filterNot(queries.Catalog.benchNames.contains)
    val base = "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors.min(32)
    val spark = GraftSession.create(s"local[$cpus]", cpus, "scale-sweep")

    def dirFor(f: Int): String = f match {
      case 1 => base
      case _ =>
        val d = s"/tmp/graft_scale_x$f"
        if (!new File(s"$d/_SMOKE_READY_V2").exists()) {
          ScaleSmoke.replicate(spark, base, d, f)
          new File(s"$d/_SMOKE_READY_V2").createNewFile()
        }
        d
    }
    def factorsFor(name: String): Seq[Int] =
      if (ExtraFactorNames.contains(name)) Factors :+ DedupExtraFactor
      else Factors

    def time(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        queries.Catalog.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // settled heap before the warm run: the 10x/30x points of earlier
      // entries leave GC fragmentation behind that otherwise inflates
      // the NEXT entry's small-n points (deflating its fitted exponent
      // — the unsafe direction for a gate that fires on alpha ABOVE
      // cap); same discipline as Bench/DbgTime blocks
      operators.EntryCaches.releaseAll()
      spark.catalog.clearCache()
      System.gc()
      once() // warm
      val t = math.min(once(), once())
      operators.EntryCaches.releaseAll()
      spark.catalog.clearCache()
      t
    }

    /** Least-squares slope of log t against log n. */
    def fitAlpha(pts: Seq[(Int, Double)]): Double = {
      val xs = pts.map(p => math.log(p._1.toDouble))
      val ys = pts.map(p => math.log(p._2))
      val xm = xs.sum / xs.size
      val ym = ys.sum / ys.size
      val cov = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
      val vx = xs.map(x => (x - xm) * (x - xm)).sum
      cov / vx
    }

    var failed = List.empty[String]
    val rows = names.flatMap { n =>
      try {
        val pts = factorsFor(n).map(f => f -> time(n, dirFor(f)))
        val alpha = fitAlpha(pts)
        val cap = Caps.getOrElse(n, DefaultCap)
        val ok = alpha <= cap
        if (!ok) failed ::= n
        val ptsStr = pts.map { case (f, t) => f"x$f ${t}%6.2f" }
          .mkString("  ")
        println(f"[sweep] $n%-28s $ptsStr  alpha $alpha%5.2f  " +
          f"cap $cap%4.2f  ${if (ok) "ok" else "FAIL"}")
        val ptsJson = pts.map { case (f, t) =>
          s""""x$f":${f"$t%.3f"}""" }.mkString(",")
        Some(s"""  "$n": {$ptsJson,"alpha":${f"$alpha%.3f"},""" +
          s""""cap":$cap,"pass":$ok}""")
      } catch {
        case e: Throwable =>
          failed ::= n
          println(s"[sweep] $n FAILED: ${e.getMessage}")
          Some(s"""  "$n": {"error":"${e.getClass.getSimpleName}","pass":false}""")
      }
    }
    val pw = new PrintWriter(outJson)
    pw.println("{\n" + rows.mkString(",\n") +
      s""",\n  "factors": [${Factors.mkString(",")}],""" +
      s"""\n  "base": "$base",\n  "failed": [${
        failed.reverse.map("\"" + _ + "\"").mkString(",")}]\n}""")
    pw.close()
    println(s"[sweep] wrote $outJson; failed = ${failed.size}")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
