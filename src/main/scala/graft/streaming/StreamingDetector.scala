package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.kernel.{AnomalyzerConf, Ensemble}

/** One observation of one series (long-format stream row). */
case class SeriesPoint(series: String, ts: Timestamp, value: Double)

/** Scored observation: the anomaly probability of the window ending at
  * this point — what the reference's `Push` returns (anomalyze.go:134-140).
  */
case class AnomalyScore(series: String, ts: Timestamp, value: Double,
    prob: Double)

/** Per-series streaming state: the bounded tail buffer (the reference's
  * Update-truncated vector, anomalyze.go:127-131) plus a monotone push
  * counter feeding the deterministic RNG seed.
  */
case class SeriesState(buffer: Array[Double], pushed: Long)

/** Streaming anomaly detection: `readStream → groupByKey(series) →
  * flatMapGroupsWithState(bounded buffer) → scores`.
  *
  * Semantics mirror the reference's streaming lifecycle exactly:
  * one output score per arriving point (`Push`), state truncated to
  * `referenceSize + activeSize` doubles per series (`Update`), `Delay`
  * gating inside the kernel. Extensions the reference leaves undefined
  * (SURVEY.md §2E): events within a micro-batch are applied in (ts,
  * value) order, and callers add `withWatermark` upstream to bound
  * out-of-order arrival — state size stays O(window) per series
  * regardless, so a 1e9-series stream costs 1e9 × windowSize doubles
  * spread across the state store, not unbounded history.
  */
object StreamingDetector {

  /** Deterministic seed base per series, bit-identical to Spark SQL's
    * `xxhash64(series)` (XXH64 over UTF-8 bytes, seed 42) — the hash
    * the batch path [[graft.operators.AnomalyOps]] uses, so batch and
    * streaming permutation-test scores agree on identical data.
    */
  def seriesHash(series: String): Long = {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(series)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
  }

  def score(points: Dataset[SeriesPoint], conf0: AnomalyzerConf)
      : Dataset[AnomalyScore] = {
    val conf = AnomalyzerConf.validated(conf0)
    implicit val stateEnc = Encoders.product[SeriesState]
    implicit val outEnc = Encoders.product[AnomalyScore]
    implicit val keyEnc = Encoders.STRING

    points.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (series: String, rows: Iterator[SeriesPoint],
         state: GroupState[SeriesState]) => {
          val prev = state.getOption.getOrElse(SeriesState(Array.empty, 0L))
          var buf = prev.buffer
          var pushed = prev.pushed
          val sh = seriesHash(series)
          // within-batch total order (the stream's ts is the clock);
          // order by full timestamp precision — getTime alone truncates
          // to ms and would drop the corpus's microsecond component
          val ordered = rows.toArray.sortBy(p =>
            (p.ts.toInstant.getEpochSecond, p.ts.toInstant.getNano, p.value))
          val out = ordered.map { p =>
            buf = (buf :+ p.value).takeRight(conf.windowSize)
            pushed += 1
            val prob = Ensemble.eval(buf, conf,
              new java.util.SplittableRandom(Ensemble.seedFor(sh, pushed)))
            AnomalyScore(series, p.ts, p.value, prob)
          }
          state.update(SeriesState(buf, pushed))
          out.iterator
        })
  }
}
