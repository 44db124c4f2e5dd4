package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Backend parity for the VERDICT-r9 #6 migration: every keyed state
  * op's `transformWithState` form must produce EXACTLY the output of
  * its `flatMapGroupsWithState` form on the same micro-batch feed —
  * both backends consume the op's one shared fold function, so a
  * mismatch here means the adapter (Tws.scala), not the op. TTL forms
  * additionally pin eviction parity: same watermark feed, same
  * forget-and-restart behavior.
  *
  * Both queries run on the RocksDB store (required by TWS, legal for
  * FMGWS) so the only varying axis is the API.
  */
class TwsParitySpec extends AnyFunSuite with SparkTestBase {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private var sinkN = 0

  /** Runs `build` over the batched MemoryStream feed, returns the
    * sink's rows rendered sortable.
    */
  private def runStream[I: Encoder, O](batches: Seq[Seq[I]], mode: String)(
      build: Dataset[I] => Dataset[O]): Seq[String] = {
    sinkN += 1
    val name = s"tws_parity_sink_$sinkN"
    val input = MemoryStream[I](spark)
    val q = build(input.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try batches.foreach { b =>
      input.addData(b)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).collect().map(_.toString).sorted.toSeq
  }

  private def assertParity(fmgws: Seq[String], tws: Seq[String],
      op: String): Unit = {
    assert(fmgws.nonEmpty, s"$op: parity scenario produced no output")
    assert(fmgws === tws, s"$op: TWS output diverges from FMGWS")
  }

  test("cms sketch: cmsBucketsTws == cmsBuckets") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    val batches = Seq(
      Seq("a", "b", "a", "c", "d", "a"),
      Seq("b", "b", "e", "a"))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingSketch.cmsBuckets(ds.toDF("t"))),
        runStream(batches, "update")(ds =>
          StreamingSketch.cmsBucketsTws(ds.toDF("t"))),
        "cmsBuckets")
    }
  }

  test("hll registers: registersTws == registers") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    val batches = Seq(
      Seq(("web", "alpha"), ("web", "beta"), ("book", "alpha")),
      Seq(("web", "gamma"), ("book", "beta"), ("web", "alpha")))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingDistinctHll.registers(ds.toDF("source", "t"))),
        runStream(batches, "update")(ds =>
          StreamingDistinctHll.registersTws(ds.toDF("source", "t"))),
        "registers")
    }
  }

  test("alerts: alertsTws == alerts (edge trigger + cooldown)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    def sc(series: String, t: Long, prob: Double) =
      AnomalyScore(series, new Timestamp(t), prob * 10, prob)
    // crossings, a level hold, a cooldown suppression, a second series
    val batches = Seq(
      Seq(sc("cpu", 1000, 0.2), sc("cpu", 2000, 0.9), sc("cpu", 3000, 0.95),
        sc("mem", 1000, 0.85)),
      Seq(sc("cpu", 4000, 0.3), sc("cpu", 5000, 0.92), // inside cooldown
        sc("mem", 70000, 0.1), sc("mem", 80000, 0.9))) // past cooldown
    withRocksDb {
      assertParity(
        runStream(batches, "append")(ds =>
          StreamingAlerts.alerts(ds, 0.8, 60L)),
        runStream(batches, "append")(ds =>
          StreamingAlerts.alertsTws(ds, 0.8, 60L)),
        "alerts")
    }
  }

  test("drift monitor: driftTws == drift") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    val ref = Map("a" -> 3L, "b" -> 1L)
    val batches = Seq(
      Seq(("web", "a"), ("web", "z"), ("book", "b")),
      Seq(("web", "a"), ("web", "b"), ("book", "q"), ("book", "a")))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingDriftMonitor.drift(ds.toDF("source", "t"), ref)),
        runStream(batches, "update")(ds =>
          StreamingDriftMonitor.driftTws(ds.toDF("source", "t"), ref)),
        "drift")
    }
  }

  test("heavy hitters: hittersTws == hitters (incl. eviction path)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    // m=2 so the third distinct token forces a SpaceSaving eviction
    val batches = Seq(
      Seq(("web", 1L, "x"), ("web", 2L, "x"), ("web", 3L, "y")),
      Seq(("web", 4L, "z"), ("web", 5L, "z"), ("web", 6L, "x")))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingHeavyHitters.hitters(ds.toDF("source", "seq", "t"), 2)),
        runStream(batches, "update")(ds =>
          StreamingHeavyHitters.hittersTws(ds.toDF("source", "seq", "t"), 2)),
        "hitters")
    }
  }

  test("incremental agg: maintainTws == maintain; TTL twin evicts and " +
    "restarts identically") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    import StreamingIncrementalAgg.{MeasureIn, MeasureTsIn}
    val batches = Seq(
      Seq(MeasureIn("N", "O", 150L), MeasureIn("N", "O", 250L),
        MeasureIn("R", "F", 100L)),
      Seq(MeasureIn("N", "O", 600L), MeasureIn("A", "F", 42L)))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingIncrementalAgg.maintain(ds.toDF())),
        runStream(batches, "update")(ds =>
          StreamingIncrementalAgg.maintainTws(ds.toDF())),
        "maintain")
      // TTL: generation 1, watermark jump far past TTL, re-arrival —
      // the group must restart from zero on BOTH backends
      def mt(flag: String, qty2: Long, tMs: Long) =
        MeasureTsIn(flag, "O", qty2, new Timestamp(tMs))
      val ttl = java.time.Duration.ofSeconds(30)
      val ttlBatches = Seq(
        Seq(mt("N", 100L, 0L)),
        Seq(mt("ZZ", 1L, 200000L)), // watermark driver: 200 s >> TTL
        Seq(mt("N", 700L, 300000L))) // N re-arrives after eviction
      assertParity(
        runStream(ttlBatches, "update")(ds =>
          StreamingIncrementalAgg.maintainTtl(ds.toDF(), ttl)),
        runStream(ttlBatches, "update")(ds =>
          StreamingIncrementalAgg.maintainTtlTws(ds.toDF(), ttl)),
        "maintainTtl")
    }
  }

  test("latest state: latestStateTws == latestState; TTL twin evicts " +
    "and restarts identically") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    import StreamingLatestState.EventIn
    def ev(id: Long, tMs: Long, user: Long, etype: String, v: Double) =
      EventIn(id, new Timestamp(tMs), user, etype, v)
    val batches = Seq(
      Seq(ev(1, 1000, 7, "click", 1.0), ev(2, 3000, 7, "click", 2.0),
        ev(3, 2000, 8, "view", 9.0)),
      // out-of-order arrival that must NOT win (older ts)
      Seq(ev(4, 500, 7, "click", 99.0), ev(5, 4000, 8, "view", 5.0)))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingLatestState.latestState(ds.toDF())),
        runStream(batches, "update")(ds =>
          StreamingLatestState.latestStateTws(ds.toDF())),
        "latestState")
      val ttl = java.time.Duration.ofSeconds(30)
      val ttlBatches = Seq(
        Seq(ev(1, 1000, 7, "click", 1.0)),
        Seq(ev(2, 200000, 99, "wm", 0.0)), // watermark far past TTL
        Seq(ev(3, 300000, 7, "click", 2.0))) // re-arrival: fresh state
      assertParity(
        runStream(ttlBatches, "update")(ds =>
          StreamingLatestState.latestStateTtl(ds.toDF(), ttl)),
        runStream(ttlBatches, "update")(ds =>
          StreamingLatestState.latestStateTtlTws(ds.toDF(), ttl)),
        "latestStateTtl")
    }
  }

  test("near-dup: bandHitsTws == bandHits; TTL twin re-claims after " +
    "eviction identically") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    val text = "w1 w2 w3 w4 w5 w6 w7 w8"
    val other = "q1 q2 q3 q4 q5 q6 q7 q8"
    val batches = Seq(
      Seq((1L, new Timestamp(1000L), text), (2L, new Timestamp(2000L), other)),
      Seq((3L, new Timestamp(3000L), text))) // near-dup of doc 1
    withRocksDb {
      assertParity(
        runStream(batches, "append")(ds =>
          StreamingNearDup.bandHits(ds.toDF("doc_id", "ts", "text"))),
        runStream(batches, "append")(ds =>
          StreamingNearDup.bandHitsTws(ds.toDF("doc_id", "ts", "text"))),
        "bandHits")
      val ttl = java.time.Duration.ofSeconds(30)
      val ttlBatches = Seq(
        Seq((1L, new Timestamp(1000L), text)),
        Seq((9L, new Timestamp(200000L), other)), // watermark driver
        Seq((3L, new Timestamp(300000L), text))) // bucket re-claimed fresh
      assertParity(
        runStream(ttlBatches, "append")(ds =>
          StreamingNearDup.bandHitsTtl(ds.toDF("doc_id", "ts", "text"), ttl)),
        runStream(ttlBatches, "append")(ds =>
          StreamingNearDup.bandHitsTtlTws(
            ds.toDF("doc_id", "ts", "text"), ttl)),
        "bandHitsTtl")
    }
  }

  test("quantile sketch: maintainTws == maintain; TTL twin evicts and " +
    "restarts identically") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    import StreamingQuantile.{ObsIn, ObsTsIn}
    val qs = Seq(50, 95)
    val batches = Seq(
      Seq(ObsIn("click", 100L), ObsIn("click", 900L), ObsIn("view", 5L)),
      Seq(ObsIn("click", 15000L), ObsIn("view", 70L)))
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingQuantile.maintain(ds.toDF(), qs)),
        runStream(batches, "update")(ds =>
          StreamingQuantile.maintainTws(ds.toDF(), qs)),
        "quantile maintain")
      val ttl = java.time.Duration.ofSeconds(30)
      val ttlBatches = Seq(
        Seq(ObsTsIn("click", 100L, new Timestamp(1000L))),
        Seq(ObsTsIn("wm", 1L, new Timestamp(200000L))),
        Seq(ObsTsIn("click", 900L, new Timestamp(300000L))))
      assertParity(
        runStream(ttlBatches, "update")(ds =>
          StreamingQuantile.maintainTtl(ds.toDF(), qs, ttl)),
        runStream(ttlBatches, "update")(ds =>
          StreamingQuantile.maintainTtlTws(ds.toDF(), qs, ttl)),
        "quantile maintainTtl")
    }
  }

  test("curation gate: decisionsTws == decisions") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val s = sparkSession
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bitmap = graft.queries.Pipeline.benchBloomBitmap(docs).persist()
    val rows = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).take(120)
      .zipWithIndex.map { case ((id, src, text), i) =>
        (id, new Timestamp(1700000000000L + i * 1000L), src, text)
      }
    val ttl = java.time.Duration.ofDays(365)
    val batches = Seq(rows.take(60).toSeq, rows.drop(60).toSeq)
    withRocksDb {
      assertParity(
        runStream(batches, "update")(ds =>
          StreamingCuration.decisions(
            ds.toDF("doc_id", "ts", "source", "text"), bitmap, ttl)),
        runStream(batches, "update")(ds =>
          StreamingCuration.decisionsTws(
            ds.toDF("doc_id", "ts", "source", "text"), bitmap, ttl)),
        "decisions")
    }
    bitmap.unpersist()
  }
}
