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

  /** Deterministic seed base per series (stable across restarts). */
  def seriesHash(series: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < series.length) { h = 31 * h + series.charAt(i); i += 1 }
    h
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
          // within-batch total order (the stream's ts is the clock)
          val ordered = rows.toArray.sortBy(p => (p.ts.getTime, p.value))
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
