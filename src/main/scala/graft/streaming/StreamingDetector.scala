package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** Deterministic per-series identity: the cross-engine md5-60 hash
    * ([[graft.kernel.PermDraw.seriesHash60]]) — the same derivation
    * the batch path [[graft.operators.AnomalyOps]] compiles into SQL,
    * so batch, streaming, and the DuckDB oracle permutation-test
    * scores agree on identical data.
    */
  def seriesHash(series: String): Long =
    graft.kernel.PermDraw.seriesHash60(series)

  /** One micro-batch of one series through the bounded buffer: the
    * shared state transition of both streaming backends.
    */
  private def applyBatch(series: String, prev: SeriesState,
      rows: Iterator[SeriesPoint],
      conf: AnomalyzerConf): (SeriesState, Array[AnomalyScore]) = {
    var buf = prev.buffer
    var pushed = prev.pushed
    val sh = seriesHash(series)
    // within-batch total order (the stream's ts is the clock); order by
    // full timestamp precision — getTime alone truncates to ms and
    // would drop the corpus's microsecond component
    val ordered = rows.toArray.sortBy(p =>
      (p.ts.toInstant.getEpochSecond, p.ts.toInstant.getNano, p.value))
    val out = ordered.map { p =>
      buf = (buf :+ p.value).takeRight(conf.windowSize)
      pushed += 1
      val prob = Ensemble.eval(buf, conf,
        new graft.kernel.PermDraw(sh, pushed))
      AnomalyScore(series, p.ts, p.value, prob)
    }
    (SeriesState(buf, pushed), out)
  }

  /** Legacy `flatMapGroupsWithState` form — kept for HDFS-backed
    * state stores and as TwsParitySpec's parity baseline; new
    * pipelines should use [[scoreTws]] (Spark's forward path: native
    * timers, RocksDB, state v2).
    */
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
          val (next, out) = applyBatch(series, prev, rows, conf)
          state.update(next)
          out.iterator
        })
  }

  /** The DEFAULT streaming form of [[score]] — the modern
    * arbitrary-state API (`transformWithState`,
    * Spark 4.x): same semantics, same probabilities, but state lives in
    * the RocksDB state store (required by this API) with fine-grained
    * per-key ValueState — the operationally preferred backend for large
    * key cardinalities. Run queries with
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider`.
    */
  /** `idleTtl`: evict a series' buffer after that much processing-time
    * inactivity (the TWS state-TTL contract: TTL requires
    * `TimeMode.ProcessingTime`). Unbounded key-cardinality streams need
    * this — per-series state is O(window), but the number of series
    * ever seen is not bounded without eviction. An evicted series that
    * re-arrives warms up from an empty buffer exactly like a new one
    * (the kernel's Delay gate holds its scores down until the window
    * refills), so expiry degrades to cold-start, never to wrong state.
    */
  def scoreTws(points: Dataset[SeriesPoint], conf0: AnomalyzerConf,
      idleTtl: Option[java.time.Duration] = None)
      : Dataset[AnomalyScore] = {
    val conf = AnomalyzerConf.validated(conf0)
    implicit val outEnc = Encoders.product[AnomalyScore]
    implicit val keyEnc = Encoders.STRING

    val timeMode =
      if (idleTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    points.groupByKey(_.series)
      .transformWithState(new DetectorProcessor(conf, idleTtl), timeMode,
        OutputMode.Append())
  }

  /** Per-series bounded-buffer processor for [[scoreTws]]. */
  class DetectorProcessor(conf: AnomalyzerConf,
      idleTtl: Option[java.time.Duration] = None)
      extends StatefulProcessor[String, SeriesPoint, AnomalyScore] {
    @transient private var state: ValueState[SeriesState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SeriesState]("buf",
        Encoders.product[SeriesState],
        idleTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(series: String,
        rows: Iterator[SeriesPoint],
        timerValues: TimerValues): Iterator[AnomalyScore] = {
      val prev = if (state.exists()) state.get()
        else SeriesState(Array.empty, 0L)
      val (next, out) = applyBatch(series, prev, rows, conf)
      state.update(next)
      out.iterator
    }
  }
}
