package graft

/** Cold-cost breakdown: `runMain graft.DbgPhases <names...>` runs each
  * catalog query once, cold, on SPARK_GRAFT_SF_DIR and prints the
  * Catalyst phase durations (analysis / optimization / planning) from
  * the QueryPlanningTracker next to the total wall — separates "the
  * plan is expensive to BUILD" from "the plan is expensive to RUN" for
  * the deep composite entries that dominate Verify's cold wall.
  */
object DbgPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32, "graft-dbgphases")
    try queries.Catalog.queries("q01_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    for (n <- args) {
      operators.EntryCaches.releaseAll(); spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val df = queries.Catalog.queries(n)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      // force analysis + optimization + physical planning (pre-AQE)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = (System.nanoTime() - t2) / 1e9
      println(f"[phases] $n%-28s build=$tBuild%.2f plan=$tPlan%.2f " +
        f"exec=$tExec%.2f")
    }
    spark.stop()
  }
}
