package graft

/** Plan inspector: `runMain graft.DbgPlan <query names...>` prints the
  * formatted physical plan of each named catalog query against the
  * sf0.001 corpus — the fast way to audit scans/exchanges/broadcasts
  * per query while iterating (pair with the plan pins in
  * ScalePropertiesSpec for the load-bearing guarantees).
  */
object DbgPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 8, "dbg-plan")
    for (n <- args) {
      println(s"===== $n =====")
      queries.Catalog.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
