package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — correlate two live event streams
  * per user: each left event pairs with the right events that follow
  * it within `horizon`.
  *
  * The scale crux is join-state eviction. A stream-stream join must
  * buffer both sides waiting for future matches; without bounds that
  * state grows with the stream. Two things bound it here, and both are
  * load-bearing: the WATERMARK on each side (how late input may
  * arrive) and the TIME-RANGE join condition (how far apart matching
  * rows may be). Together they let Spark compute, per side, the oldest
  * row that could still match anything, and drop state behind it —
  * the buffered window stays O(events per horizon+delay), independent
  * of stream length.
  *
  * In batch the same function is the plain interval equi-join
  * (`withWatermark` is a no-op on batch Datasets), which is what the
  * parity spec pins streaming output against.
  */
object StreamJoin {

  /** Pairs (left event, right event ≤ `horizon` later) per user.
    * Inputs are `events`-shaped (`user_id`, `ts`, `event_type`);
    * output: one row per qualifying pair.
    */
  def followWithin(
      left: DataFrame,
      right: DataFrame,
      horizon: String,
      delay: String): DataFrame =
    joined(left, right, horizon, delay, "inner")

  /** Left-outer variant: left events with NO follower within `horizon`
    * still emit (null right columns) — but only once the watermark has
    * passed `l_ts + horizon + delay`, i.e. once no qualifying right row
    * can still arrive. That deferred emission is the semantic cost of
    * outer results on unbounded streams; in batch it degenerates to a
    * plain left-outer interval join (what the parity spec compares).
    */
  def followWithinOuter(
      left: DataFrame,
      right: DataFrame,
      horizon: String,
      delay: String): DataFrame =
    joined(left, right, horizon, delay, "leftOuter")

  private def joined(
      left: DataFrame,
      right: DataFrame,
      horizon: String,
      delay: String,
      how: String): DataFrame = {
    val l = left
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"))
      .withWatermark("l_ts", delay)
    val r = right
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_type").as("r_type"))
      .withWatermark("r_ts", delay)
    l.join(r, expr("user_id = r_user AND " +
        s"r_ts >= l_ts AND r_ts <= l_ts + interval $horizon"), how)
      .select(col("user_id"), col("l_ts"), col("l_type"),
        col("r_ts"), col("r_type"))
  }
}
