package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the online form of the batch
  * q20 sessionize query: events group into sessions that close when
  * `gap` passes with no activity, aggregated as they close.
  *
  * Built on `session_window`, Spark's native session aggregation: state
  * per (user, open session), merged as events arrive, emitted
  * append-mode once the watermark passes session end + gap — so
  * emitted sessions are FINAL (no retraction downstream), and state is
  * bounded by the number of concurrently-open sessions within the
  * watermark horizon, independent of stream length.
  *
  * The session sum goes through the same exact integer micro-sum as
  * the batch pipeline queries: within a session the double-add order
  * is engine-internal, so summing round(value·1e6) as BIGINT keeps the
  * streaming and batch aggregates bit-identical (the parity the spec
  * pins — `session_window` works unchanged on a batch Dataset).
  */
object StreamSessions {

  /** Closed sessions per user: bounds, event count, exact micro-sum.
    * Input is `events`-shaped (`user_id`, `ts`, `value`).
    */
  def sessions(events: DataFrame, gap: String, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 1e6) as bigint)")).as("sum_v6"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_v6"))
}
