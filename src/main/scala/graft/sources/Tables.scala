package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical readers for the test corpus (TESTDATA.md).
  *
  * `events.ts` has shipped under three parquet encodings across corpus
  * generations: TIMESTAMP(NANOS) (read as nano-epoch longs via
  * legacy.parquet.nanosAsLong and converted losslessly — no
  * sub-microsecond components), TIMESTAMP(MICROS) without UTC
  * adjustment (read as TIMESTAMP_NTZ, reinterpreted as the instant
  * under the engine-wide UTC session zone — exactly DuckDB's naive
  * `epoch()` semantics), and plain TimestampType. The reader adapts on
  * schema, so every downstream query sees one canonical TimestampType
  * column. All other tables read natively. Column pruning and filter
  * pushdown reach the scans because nothing here materializes — callers
  * compose on the lazy DataFrame.
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
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => // nano-epoch longs (legacy nanosAsLong read)
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => // micros, not UTC-adjusted: pin as UTC
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
}
