package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AnomalyFunctions
import graft.kernel.AnomalyzerConf

/** Sliding-window anomaly detection over long-format series data.
  *
  * The batch analog of the reference's per-point `Push → Eval` loop
  * (/root/reference/anomalyze.go:134-140): every row gets the anomaly
  * probability of the window ending at that row. Scaling model: the
  * hash shuffle on the series key is the only required data movement —
  * all per-series work then happens partition-locally in one Window
  * operator, so throughput scales linearly with executors × series.
  * Per-window state is `windowSize` doubles (bounded, like the
  * reference's Update truncation), so there is no spill risk in the
  * evaluator itself; hot-series skew is AQE/salting territory
  * (SURVEY.md §4).
  */
object AnomalyOps {

  /** Appends anomaly columns to `df`.
    *
    * @param series   series key column (partition axis)
    * @param ts       event-time ordering column
    * @param value    observed DOUBLE column
    * @param conf     detection config (validated here, analysis-time)
    * @param tieBreak extra ordering columns making row order total, so
    *                 results are reproducible across partitionings
    * @param byTest   also emit the per-test probability map
    */
  def withAnomalyProbs(
      df: DataFrame,
      series: Column,
      ts: Column,
      value: Column,
      conf: AnomalyzerConf,
      tieBreak: Seq[Column] = Nil,
      byTest: Boolean = false): DataFrame = {
    val c = AnomalyzerConf.validated(conf)
    val ord = ts +: tieBreak
    val w = Window.partitionBy(series).orderBy(ord: _*)
    // The evaluation window = the buffer the reference would hold after
    // Update-truncation: the last (reference+active) points inclusive.
    val frame = w.rowsBetween(-(c.windowSize - 1), 0)
    // Deterministic seed independent of physical partitioning: the same
    // Ensemble.seedFor(xxhash64(series), position) derivation as the
    // streaming path and the sequential facade, so all three evaluation
    // paths produce identical permutation-test probabilities.
    val sHash = xxhash64(series)
    val rowKey = row_number().over(w).cast("long")
    val windowed = df
      .withColumn("window", collect_list(value.cast("double")).over(frame))
      .withColumn("anomaly_prob",
        AnomalyFunctions.anomaly_prob(col("window"), sHash, rowKey, c))
    val result =
      if (byTest) windowed.withColumn("anomaly_probs",
        AnomalyFunctions.anomaly_probs_by_test(col("window"), sHash, rowKey, c))
      else windowed
    result.drop("window")
  }
}
