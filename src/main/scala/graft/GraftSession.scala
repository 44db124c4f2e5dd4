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
      // 64 MB broadcast threshold (default 10 MB): the catalog's
      // corpus-derived dims (query-term sets, bench shingle sets,
      // dedup pair lists) are deliberately UNHINTED so AQE decides
      // from their TRUE runtime size — this is the size it decides
      // against. Executors sized for a 100 TB corpus hold a 64 MB
      // broadcast comfortably, and an adversarially large side still
      // degrades to a shuffle join instead of a driver OOM, which a
      // hard broadcast() hint cannot do.
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sources.Tables.configure(spark)
    spark
  }
}
