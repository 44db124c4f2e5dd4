package tmpverify

object A13Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32, "a13prof")
    val dir = "/root/testdata/sf0.1"
    // session warmup on an unrelated query (mirrors Verify's warmup)
    graft.queries.Catalog.queries("q01_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (name <- Seq("a07_anomaly_diff", "a13_anomaly_perm500_chunked")) {
      graft.operators.EntryCaches.releaseAll()
      spark.catalog.clearCache(); System.gc()
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Catalog.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s runs ${ts.map(t => f"$t%5.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
