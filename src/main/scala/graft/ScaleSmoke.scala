package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale smoke: replicates the sf0.1 corpus N times with offset
  * keys into a temp dir, then times named catalog entries against both
  * the base and replicated corpora — the fast falsifier for "this plan
  * is linear in the corpus" claims (the IVF-k, p94-window, and p52-cut
  * fixes were all motivated by THIS check, not the oracle gate, which
  * cannot see super-linearity).
  *
  * `runMain graft.ScaleSmoke [factor] [name ...]` — defaults: factor
  * 10, the scale-suspect set. Prints per-entry base/replicated seconds
  * (best of 2 warmed runs each). Caveat from SURVEY §8: exact
  * replication gives every doc N−1 identical twins, so near-dup pair
  * volume inflates ~N² for dedup-family entries — interpret those
  * against the dedup-specific expectations, not raw linearity.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // both arguments optional: a leading integer is the factor, any
    // remaining (or all, if the first isn't numeric) args are entry
    // names
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val rest = if (args.headOption.exists(_.toIntOption.isDefined))
      args.drop(1).toSeq else args.toSeq
    val names = if (rest.nonEmpty) rest
      else Seq("p94_epoch_schedule", "p85_vocab_coverage", "p52_pagerank",
        "p81_contam_semantic", "p63_sim_ivfpq", "p15_sim_ivf",
        "p35_semdedup", "p04_dedup_minhash_lsh")
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$factor"
    val cpus = Runtime.getRuntime.availableProcessors.min(32)
    val spark = GraftSession.create(s"local[$cpus]", cpus, "scale-smoke")

    if (!new java.io.File(s"$out/_SMOKE_READY_V2").exists()) {
      replicate(spark, base, out, factor)
      new java.io.File(s"$out/_SMOKE_READY_V2").createNewFile()
    }

    def time(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        queries.Catalog.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val t = math.min(once(), once())
      operators.EntryCaches.releaseAll()
      spark.catalog.clearCache()
      t
    }
    for (n <- names) {
      try {
        val tb = time(n, base)
        val tx = time(n, out)
        println(f"[scale] $n%-28s base $tb%6.2f s  x$factor $tx%6.2f s  " +
          f"ratio ${tx / tb}%5.2f (linear = $factor.0)")
      } catch {
        case e: Throwable => println(s"[scale] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  /** Writes factor-replicated copies of the key-bearing tables with
    * disjoint id ranges; pure dimension tables copy through unchanged.
    * Facts: documents/embeddings/events by their id, orders+lineitem
    * by orderkey (consistently, so the join still matches within each
    * copy — customer/part/supplier stay dimensions and just get N×
    * hotter, which is the realistic fact-grows-dims-don't shape).
    */
  private[graft] def replicate(spark: SparkSession, base: String,
      out: String, factor: Int): Unit = {
    val reps = Seq(
      "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"),
      "events" -> Seq("event_id"), "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey"))
    // The copy offset must clear EVERY replicated key or copies alias
    // (colliding ids corrupt join cardinalities and the sweep's fitted
    // exponents) — derive it from the observed max instead of a fixed
    // constant, rounded up to a power of 10 so replicated ids stay
    // readable. One tiny max() aggregate per table, paid once per run.
    val maxKey = reps.map { case (name, keys) =>
      sources.Tables.table(spark, base, name)
        .agg(max(col(keys.head)).cast("long")).head.getLong(0)
    }.max
    var off = 100000000L
    while (off <= maxKey) off *= 10L
    val Off = off
    def rep(name: String, keys: Seq[String]): Unit = {
      val d = sources.Tables.table(spark, base, name)
      val copies = (0 until factor).map(i =>
        keys.foldLeft(d)((f, k) => f.withColumn(k, col(k) + lit(i * Off))))
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    reps.foreach { case (n, ks) => rep(n, ks) }
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }
}
