package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** `transformWithState` adapters for the keyed state operators.
  *
  * Every graft streaming state op is a per-key BATCH FOLD — pure
  * function (key, previous state, micro-batch rows) → (next state,
  * output rows) — so the migration from `flatMapGroupsWithState` to
  * the arbitrary-state v2 API is one shared shim, not ten bespoke
  * processors. Each operator factors its fold out of the FMGWS
  * closure and feeds the SAME function to both backends; the
  * stream==batch pins then hold for TWS structurally, and the per-op
  * parity specs pin it empirically.
  *
  * Why TWS is the forward path (VERDICT r9 #6): one API for value/
  * list/map state, native per-state TTL, timers decoupled from state
  * rows, and the RocksDB store required by the API is the backend a
  * large-cardinality deployment runs anyway. The FMGWS forms remain
  * for checkpoint compatibility with existing queries (the two APIs
  * cannot share a checkpoint).
  *
  * Eviction parity: the FMGWS TTL forms arm
  * `setTimeoutTimestamp(max(act_hw + ttl, watermark + 1))` — fire
  * when the watermark passes the key's activity HIGH-WATER plus the
  * idle TTL. [[TtlFoldProcessor]] arms a TWS event-time timer at the
  * same instant, deleting the stale timer on every re-arm (TWS timers
  * are not replaced implicitly the way setTimeoutTimestamp is), and
  * clears the key's state when it fires: expiry forgets the key
  * entirely, a re-arrival starts fresh — the contract
  * StreamingStateTtlSpec pins.
  */
object Tws {

  /** Value-state processor from a pure per-batch fold (the NoTimeout
    * shape). State lives until the query dies — bounded-key-space ops
    * (sketch grids, HLL registers) or bounded corpora.
    */
  class FoldProcessor[K, I, S, O](
      fold: (K, Option[S], Iterator[I]) => (S, Iterator[O]))(
      implicit stateEnc: Encoder[S])
      extends StatefulProcessor[K, I, O] {
    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("s", stateEnc, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[I],
        timerValues: TimerValues): Iterator[O] = {
      val (next, out) = fold(key,
        if (state.exists()) Some(state.get()) else None, rows)
      state.update(next)
      out
    }
  }

  /** [[FoldProcessor]] plus event-time idle eviction: the state type
    * carries its activity high-water (max event ms ever seen for the
    * key, extracted by `actMsOf`), and the key is forgotten when the
    * watermark passes high-water + `idleTtlMs`. Deterministic like the
    * FMGWS forms: eviction depends only on data timestamps and
    * configured delays, never wall clock.
    */
  class TtlFoldProcessor[K, I, S, O](
      fold: (K, Option[S], Iterator[I]) => (S, Iterator[O]),
      actMsOf: S => Long,
      idleTtlMs: Long)(implicit stateEnc: Encoder[S])
      extends StatefulProcessor[K, I, O] {
    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("s", stateEnc, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[I],
        timerValues: TimerValues): Iterator[O] = {
      val (next, out) = fold(key,
        if (state.exists()) Some(state.get()) else None, rows)
      state.update(next)
      // re-arm: TWS registers timers cumulatively, so drop the stale
      // deadline first — the live deadline must only ever come from
      // the activity high-water (an out-of-order batch must not pull
      // it backwards; actMsOf is monotone by the ops' fold contract).
      // Materialize before deleting: listTimers() is backed by the
      // state-store iterator, and mutating mid-traversal is defined
      // only for snapshot-isolated providers (RocksDB), undefined for
      // the rest.
      getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(actMsOf(next) + idleTtlMs,
        timerValues.getCurrentWatermarkInMs() + 1))
      out
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[O] = {
      state.clear()
      Iterator.empty
    }
  }
}
