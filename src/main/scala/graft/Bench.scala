package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Catalog.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Results are fully materialized through the noop sink so count-only
  * shortcuts can't flatter the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession.create(s"local[$cpus]", cpus, "graft-bench")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try queries.Catalog.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/session warmup on the smallest SF so the first measured query
    // doesn't pay classloading + codegen compilation
    try queries.Catalog.queries("q01_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    val results = queries.Catalog.benchNames.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
