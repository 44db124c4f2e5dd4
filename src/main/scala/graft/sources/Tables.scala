package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical readers for the test corpus (TESTDATA.md).
  *
  * `events.parquet` carries TIMESTAMP(NANOS), which Spark's vectorized
  * parquet reader rejects; we read it as nano-epoch longs
  * (legacy.parquet.nanosAsLong) and convert losslessly to TimestampType
  * (the corpus has no sub-microsecond components). All other tables read
  * natively. Column pruning and filter pushdown reach the scans because
  * nothing here materializes — callers compose on the lazy DataFrame.
  */
object Tables {

  /** SQL confs every graft session should carry. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
}
