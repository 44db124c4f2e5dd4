package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup — the online form of the batch exact-dedup
  * operators (p01/p02 in [[graft.queries.Pipeline]]): documents arriving
  * on a stream are keyed by the same normalized-content 60-bit md5 hash
  * and only the FIRST arrival of each content survives.
  *
  * State is the crux at scale: plain `dropDuplicates` keeps every key
  * forever (unbounded state on an unbounded stream), so this uses
  * `dropDuplicatesWithinWatermark` — duplicates are suppressed while
  * their content hash is within the watermark horizon, and the key's
  * state is evicted once the watermark passes it. That bounds state at
  * O(distinct keys per horizon) and matches how ingest pipelines
  * actually behave: re-crawls of the same page arrive close together;
  * a months-later re-crawl is a re-ingest, not a duplicate.
  */
object StreamingDedup {

  /** First arrival per normalized content within the watermark horizon.
    * Input needs `text` and an event-time `ts`; all input columns pass
    * through, plus the `content_hash` used as the dedup key.
    */
  def firstArrivals(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("content_hash", expr(graft.functions.HashScheme.h60Spark(
        "lower(regexp_replace(trim(text), '\\\\s+', ' '))")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
}
