package tmpverify

object P58Entry {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32, "p58entry")
    val dir = "/root/testdata/sf0.1"
    for (name <- Seq("p58_bm25_topk", "p60_hybrid_rrf")) {
      graft.operators.EntryCaches.releaseAll()
      spark.catalog.clearCache(); System.gc()
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.queries.Catalog.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val ts = (1 to 3).map(_ => run())
      println(f"[prof] $name%-18s median ${ts.sorted.apply(1)}%6.3f  runs ${ts.map(t => f"$t%5.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
