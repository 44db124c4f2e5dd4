package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DetectorsSpec extends AnyFunSuite with SparkTestBase {

  test("fused single-pass detectors are bit-identical to plain") {
    val spec = Detectors.Spec(activeSize = 2, nSeasons = 4,
      upperBound = 500.0, lowerBound = Some(0.0))
    val events = graft.sources.Tables.events(spark, sfDir)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rn") >= spec.windowSize)
        .select("event_type", "event_id", "prob_magnitude", "prob_fence",
          "prob_cdf", "prob_ensemble")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
    val plain = collect(Detectors.withProbs(events, col("event_type"),
      col("ts"), Seq(col("event_id")), col("value"), spec))
    val fused = collect(Detectors.withProbsFused(events, col("event_type"),
      col("ts"), Seq(col("event_id")), col("value"), spec))
    assert(fused.size === plain.size)
    assert(fused === plain)
  }

  test("chunked deterministic detectors are bit-identical to plain") {
    val spec = Detectors.Spec(activeSize = 2, nSeasons = 4,
      upperBound = 500.0, lowerBound = Some(0.0))
    val events = graft.sources.Tables.events(spark, sfDir)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "event_id", "rn", "prob_magnitude",
          "prob_fence", "prob_cdf", "prob_ensemble")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getDouble(6)))
        .toMap
    val plain = collect(Detectors.withProbs(events, col("event_type"),
      col("ts"), Seq(col("event_id")), col("value"), spec))
    // chunk far smaller than any series so every series spans chunks
    val chunked = collect(Detectors.withProbsChunked(events, col("event_type"),
      col("ts"), Seq(col("event_id")), col("value"), spec, chunkSize = 32))
    assert(chunked.size === plain.size)
    assert(chunked === plain)
  }
}
