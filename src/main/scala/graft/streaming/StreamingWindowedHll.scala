package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashScheme => H, HllSketch => Hll}

/** Windowed distinct cardinality over an event stream — "distinct
  * users per series per hour" at 100 TB: HLL registers maintained by
  * Spark's DECLARATIVE windowed aggregation (contrast
  * [[StreamingDistinctHll]]'s custom keyed state), so the engine owns
  * the state store, the watermark EVICTS closed windows (state is
  * live-windows × keys × ≤64 registers, never stream-length), and
  * late rows beyond the watermark are dropped by the same mechanism —
  * no hand-written TTL.
  *
  * The register transform is the shared 60-bit md5 split; `max` is
  * the aggregate, so any micro-batch slicing and at-least-once replay
  * inside the watermark converge to the batch registers of the same
  * rows (the [[StreamingDistinctHll]] idempotence argument, here
  * inherited from the built-in max aggregate). Estimates fold through
  * the shared [[HllSketch.estimate]].
  */
object StreamingWindowedHll {

  /** Update-mode stream over (source STRING, ts TIMESTAMP, t STRING):
    * one (window, source, bucket, m) row per touched register per
    * micro-batch; windows older than `watermarkDelay` behind the max
    * observed ts are evicted and late arrivals into them dropped.
    */
  def registers(
      events: DataFrame,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("h", expr(H.h60Spark("t")))
      .withColumn("bucket", expr(s"h div ${Hll.SuffixMod}"))
      .withColumn("w", expr(s"h % ${Hll.SuffixMod}"))
      .withColumn("rho",
        when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w"))).cast("long")))
      .groupBy(window(col("ts"), windowDuration), col("source"),
        col("bucket"))
      .agg(max(col("rho")).as("m"))
      .select(col("window.start").as("win_start"), col("source"),
        col("bucket"), col("m"))

  /** Per (window, source) cardinality estimates from a materialized
    * register table (latest row per (win_start, source, bucket)).
    */
  def estimate(registers: DataFrame): DataFrame =
    Hll.estimate(registers, Seq("win_start", "source"))
}
