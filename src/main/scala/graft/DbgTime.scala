package graft

/** Ad-hoc query timer: `runMain graft.DbgTime <names...>` materializes
  * each named catalog query through the noop sink (warmup + 3 timed
  * runs, clean cache + GC between blocks, same protocol as Bench) on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints per-run seconds —
  * the local iteration loop for plan/kernel A/Bs without editing
  * Bench's graded list.
  */
object DbgTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = GraftSession.create(s"local[$cpus]", cpus, "graft-dbgtime")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      queries.Catalog.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // session warmup so the first block doesn't pay codegen/classload
    try once(args.headOption.getOrElse("q01_agg")) catch { case _: Throwable => }
    for (n <- args) {
      operators.EntryCaches.releaseAll(); spark.catalog.clearCache()
      System.gc()
      val xs = (1 to runs).map(_ => once(n))
      println(f"[dbgtime] $n%-28s ${xs.map(x => f"$x%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
