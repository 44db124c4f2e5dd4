package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: one place that wires the confs this
  * engine expects — shuffle parallelism sized to the machine (not
  * Spark's default 200), AQE for runtime re-planning and skew joins,
  * UTC session time, the corpus's nano-timestamp read mode, and the
  * graft SQL functions. `Bench`/`Verify` build through here; library
  * users can instead call [[GraftExtensions.register]] /
  * [[graft.sources.Tables.configure]] on an existing session.
  */
object GraftSession {

  def create(
      master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sources.Tables.configure(spark)
    spark
  }
}
