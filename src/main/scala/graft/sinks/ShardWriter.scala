package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline's shipping seam: write a corpus as partitioned parquet
  * shards with a bounded records-per-file, and return the manifest of
  * what was ACTUALLY written — read back from the files themselves,
  * not echoed from the plan — so a release step can verify conservation
  * (no rows lost or duplicated between the frame and the directory)
  * before publishing.
  *
  * Shape at scale: `partitionBy` routes rows to Hive-style
  * `col=value/` directories at write time (downstream readers get
  * partition PRUNING for free — a lang-filtered training run never
  * lists the other languages' files), and `maxRecordsPerFile` bounds
  * shard size so a 100 TB corpus ships as uniformly-consumable files
  * instead of one skewed-partition monolith. The manifest pass is one
  * `input_file_name()` group-by over the written data — the same scan
  * a consumer's first epoch pays anyway.
  */
object ShardWriter {

  /** Write `df` partitioned by `partitionCol`, at most
    * `maxRecordsPerFile` rows per shard file; returns the per-file
    * manifest (file, partition value, rows).
    */
  def writeSharded(
      spark: SparkSession,
      df: DataFrame,
      outDir: String,
      partitionCol: String,
      maxRecordsPerFile: Long): DataFrame = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionCol)
      .parquet(outDir)
    manifest(spark, outDir, partitionCol)
  }

  /** Per-file manifest of a sharded directory, from the data itself. */
  def manifest(
      spark: SparkSession,
      dir: String,
      partitionCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"),
        col(partitionCol).cast("string").as("partition_value"))
      .agg(count(lit(1)).as("rows"))
}
