package graft

/** Catalog-wide unpartitioned-window census: prints every window with
  * an EMPTY partitionSpec per catalog entry — logical nodes AND those
  * hiding inside persisted subtrees (see [[PlanAudit]]) — each one a
  * single-task global sort at execution time ("No Partition Defined
  * for Window operation"), the p94-class scale killer. Pair with
  * ScalePropertiesSpec's allowlist pin; this main is the fast way to
  * audit a new entry while iterating.
  */
object DbgWindows {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 8, "dbg-windows")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    queries.Catalog.all.foreach { e =>
      try {
        val wins = PlanAudit.unpartitionedWindows(e.run(spark, dir))
        if (wins.nonEmpty) {
          println(s"${e.name}: ${wins.size} unpartitioned window(s)")
          wins.foreach(w => println(s"  $w"))
        }
      } catch {
        case ex: Throwable => println(s"${e.name}: ERROR ${ex.getMessage}")
      }
    }
    spark.stop()
  }
}

/** Catalog-wide forced-broadcast census: prints every `broadcast()`
  * hint per entry (see [[PlanAudit.broadcastHints]]). Pair with
  * ScalePropertiesSpec's allowedBroadcastHints pin; this main is the
  * fast way to audit a new entry's hints while iterating.
  */
object DbgBroadcasts {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 8, "dbg-broadcasts")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    queries.Catalog.all.foreach { e =>
      try {
        val hints = PlanAudit.broadcastHints(e.run(spark, dir))
        if (hints.nonEmpty) {
          println(s"${e.name}: ${hints.size} broadcast hint(s)")
          hints.foreach(h => println(s"  $h"))
        }
      } catch {
        case ex: Throwable => println(s"${e.name}: ERROR ${ex.getMessage}")
      }
    }
    spark.stop()
  }
}
