package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.StreamingLatestState.EventIn

/** Pins the event-time idle-TTL contract of the per-key state ops:
  * (1) the state store stays bounded by the LIVE-key set under key
  * churn, not by every key ever seen, and (2) eviction forgets the key
  * entirely — a re-arriving expired key starts fresh. Both are
  * event-time properties (watermark-driven), so the pins are
  * deterministic: no sleeps, no wall-clock.
  */
class StreamingStateTtlSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, tMs: Long, user: Long, etype: String,
      value: Double) = EventIn(id, new Timestamp(tMs), user, etype, value)

  private val ttl = java.time.Duration.ofSeconds(30)

  test("key churn: state rows track the live-key set, dead keys evict " +
    "as the watermark passes their TTL horizon") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession

    val input = MemoryStream[EventIn](sparkSession)
    val query = StreamingLatestState.latestStateTtl(input.toDF(), ttl)
      .writeStream.format("memory").queryName("ttl_churn_sink")
      .outputMode("update").start()
    try {
      // 3 generations of 20 one-shot keys, 100 s of event time apart —
      // each generation is far beyond the previous one's 30 s TTL
      for (gen <- 0 until 3) {
        val base = gen * 100000L
        input.addData((0 until 20).map(k =>
          ev(gen * 100 + k, base, gen * 1000 + k, "click", k.toDouble)): _*)
        query.processAllAvailable()
        // a second batch per generation so the watermark (computed
        // from the PREVIOUS batch's max event time) actually advances
        // past the older generation before the next one arrives
        input.addData(ev(gen * 100 + 99, base + 1000L, 999999L, "wm", 0.0))
        query.processAllAvailable()
      }
      val rows = query.lastProgress.stateOperators.head.numRowsTotal
      // live set = generation 2's 20 keys + the watermark-driver key;
      // without eviction this would be 61 — the bound is the whole pin
      // (numRowsRemoved in lastProgress covers only the final
      // micro-batch, so it cannot see the earlier generations' drops)
      assert(rows <= 25,
        s"state store holds $rows rows — dead generations not evicted")
    } finally query.stop()
  }

  test("expiry forgets the key: a re-arriving expired key restarts " +
    "n_events at 1 (no-TTL twin keeps counting)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession

    def lastCountFor(sink: String, user: Long): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type")
        .orderBy(col("last_ts").desc, col("n_events").desc)
      spark.table(sink)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1 && col("user_id") === user)
        .select("n_events").collect().head.getLong(0)
    }

    val inTtl = MemoryStream[EventIn](sparkSession)
    val qTtl = StreamingLatestState.latestStateTtl(inTtl.toDF(), ttl)
      .writeStream.format("memory").queryName("ttl_expiry_sink")
      .outputMode("update").start()
    val inPlain = MemoryStream[EventIn](sparkSession)
    val qPlain = StreamingLatestState.latestState(inPlain.toDF())
      .writeStream.format("memory").queryName("ttl_expiry_plain_sink")
      .outputMode("update").start()
    try {
      val feed = Seq(
        Seq(ev(1, 10000L, 7, "click", 1.0)),         // key 7 appears
        Seq(ev(2, 200000L, 8, "click", 2.0)),        // watermark -> 10 s
        Seq(ev(3, 300000L, 8, "click", 3.0)),        // watermark -> 200 s:
                                                     // key 7 expired (10+30)
        Seq(ev(4, 400000L, 7, "click", 4.0)))        // key 7 re-arrives
      for (batch <- feed) {
        inTtl.addData(batch: _*); qTtl.processAllAvailable()
        inPlain.addData(batch: _*); qPlain.processAllAvailable()
      }
      assert(lastCountFor("ttl_expiry_sink", 7L) === 1L,
        "expired key must restart fresh — eviction is forget, not pause")
      assert(lastCountFor("ttl_expiry_plain_sink", 7L) === 2L,
        "the no-TTL twin must keep the key's full history")
    } finally { qTtl.stop(); qPlain.stop() }
  }

  test("an in-allowance OUT-OF-ORDER batch never pulls the eviction " +
    "deadline backwards (deadline = activity high-water + TTL)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession

    val input = MemoryStream[EventIn](sparkSession)
    // generous allowance so the late event is in-allowance
    val query = StreamingLatestState
      .latestStateTtl(input.toDF(), ttl, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ttl_ooo_sink")
      .outputMode("update").start()
    try {
      val feed = Seq(
        Seq(ev(1, 1000000L, 7, "click", 1.0)),  // K active at t=1000s
        Seq(ev(2, 500000L, 7, "click", 2.0)),   // LATE K event, t=500s:
                                                // must NOT move K's
                                                // deadline back to 530s
        Seq(ev(3, 1010000L, 8, "click", 3.0)),  // wm -> 1000s-10m=400s
        Seq(ev(4, 1620000L, 8, "click", 4.0)),  // wm -> 1010s-10m=410s
        Seq(ev(5, 1625000L, 7, "click", 6.0)))  // wm -> 1620s-10m=1020s:
                                                // past the BUGGY 530s
                                                // deadline, before the
                                                // true 1030s one — K
                                                // must still be live
      for (batch <- feed) {
        input.addData(batch: _*); query.processAllAvailable()
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy(col("n_events").desc)
      val n = spark.table("ttl_ooo_sink")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1 && col("user_id") === 7)
        .select("n_events").collect().head.getLong(0)
      // buggy behavior (deadline from the late batch alone = 530 s):
      // K evicted when the watermark reached 1020 s and event 6
      // restarts at n=1; correct behavior keeps all 3 events
      assert(n === 3L,
        s"key evicted inside its TTL horizon after an out-of-order " +
          s"batch (final n_events = $n, expected 3)")
    } finally query.stop()
  }

  test("incremental agg + quantile sketch share the contract: expired " +
    "group/series rebuilds from post-expiry rows alone") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    import StreamingIncrementalAgg.MeasureTsIn
    import StreamingQuantile.ObsTsIn

    def t(ms: Long) = new Timestamp(ms)

    val aggIn = MemoryStream[MeasureTsIn](sparkSession)
    val qAgg = StreamingIncrementalAgg.maintainTtl(aggIn.toDF(), ttl)
      .writeStream.format("memory").queryName("ttl_agg_sink")
      .outputMode("update").start()
    val skIn = MemoryStream[ObsTsIn](sparkSession)
    val qSk = StreamingQuantile.maintainTtl(skIn.toDF(), Seq(50), ttl)
      .writeStream.format("memory").queryName("ttl_sk_sink")
      .outputMode("update").start()
    try {
      // group A gets 2 rows, goes quiet; watermark sails past A+TTL on
      // other-group traffic; A re-arrives with 1 row -> n must be 1,
      // not 3
      val aggBatches = Seq(
        Seq(MeasureTsIn("A", "F", 100L, t(10000L)),
          MeasureTsIn("A", "F", 300L, t(11000L))),
        Seq(MeasureTsIn("B", "O", 100L, t(200000L))),
        Seq(MeasureTsIn("B", "O", 100L, t(300000L))),
        Seq(MeasureTsIn("A", "F", 500L, t(400000L))))
      aggBatches.foreach { b =>
        aggIn.addData(b: _*); qAgg.processAllAvailable()
      }
      val aggNs = spark.table("ttl_agg_sink")
        .filter(col("flag") === "A")
        .collect().map(_.getLong(2)).toSet
      assert(aggNs === Set(2L, 1L),
        s"expected the pre-expiry n=2 view then a fresh n=1 restart " +
          s"(n=3 would mean the evicted state leaked back); got $aggNs")

      val skBatches = Seq(
        Seq(ObsTsIn("A", 100L, t(10000L)), ObsTsIn("A", 200L, t(11000L))),
        Seq(ObsTsIn("B", 100L, t(200000L))),
        Seq(ObsTsIn("B", 100L, t(300000L))),
        Seq(ObsTsIn("A", 999L, t(400000L))))
      skBatches.foreach { b =>
        skIn.addData(b: _*); qSk.processAllAvailable()
      }
      val ns = spark.table("ttl_sk_sink")
        .filter(col("event_type") === "A")
        .select("n").collect().map(_.getLong(0)).sorted
      assert(ns.contains(2L), "pre-expiry sketch reached n=2")
      assert(ns.head === 1L && ns.last === 2L,
        "re-arriving expired series must rebuild its sketch from " +
          "scratch (n=1), never carry the evicted counts (n=3)")
    } finally { qAgg.stop(); qSk.stop() }
  }

  test("curation gate shares the contract: a duplicate arriving after " +
    "the claim's TTL re-claims fresh (re-ingest, not duplicate); " +
    "inside the TTL it is flagged") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    import java.sql.Timestamp
    // a tiny clean doc (passes quality: >= 30 tokens, high variety)
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val bitmap = graft.queries.Pipeline
      .benchBloomBitmap(Seq((0L, text)).toDF("doc_id", "text"))
    val input = MemoryStream[(Long, Timestamp, String, String)](sparkSession)
    val query = StreamingCuration
      .decisions(input.toDF().toDF("doc_id", "ts", "source", "text"),
        bitmap, java.time.Duration.ofSeconds(30))
      .writeStream.format("memory").queryName("cur_ttl_sink")
      .outputMode("update").start()
    try {
      def t(ms: Long) = new Timestamp(ms)
      val base = 1000000L // clear of the initial zero watermark
      input.addData((1L, t(base), "s", text))          // claims
      query.processAllAvailable()
      input.addData((2L, t(base + 1000L), "s", text))  // inside TTL: dup
      query.processAllAvailable()
      // advance the watermark far past the claim's TTL horizon
      input.addData((99L, t(base + 500000L), "s", "short"))
      query.processAllAvailable()
      input.addData((3L, t(base + 600000L), "s", text)) // expired: fresh
      query.processAllAvailable()
      val dupById = spark.table("cur_ttl_sink").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(!dupById(1L), "first arrival claims")
      assert(dupById(2L), "in-TTL duplicate must be flagged")
      assert(!dupById(3L),
        "post-TTL arrival is a re-ingest and must claim fresh")
    } finally query.stop()
  }
}
