package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.kernel.AnomalyzerConf
import graft.streaming.{SeriesPoint, StreamingDetector, StreamingNearDup}

/** Streaming throughput bench (VERDICT r11 #6): replays the sf corpus
  * through the two flagship keyed-state operators on BOTH backends and
  * prints ONE JSON line with rows/s, wall seconds, and state-store
  * size, so the streaming story has recorded numbers next to its
  * parity pins (TwsParitySpec pins WHAT the backends compute — this
  * records HOW FAST).
  *
  * Workloads:
  *  - detector: events.parquet → SeriesPoint(series = event_type #
  *    user_id%200 → ~1 000 series), scored by the bounded-buffer
  *    ensemble (the StreamingDetectorSpec conf — magnitude/fence/cdf/
  *    highrank, no bootstrap) across N micro-batches in ts order.
  *  - neardup: documents.parquet → MinHash-LSH band claims
  *    (16 band rows/doc of keyed first-claim state).
  *
  * Both backends run on the RocksDB store (required by TWS, legal for
  * FMGWS) so the measured axis is the API, plus one FMGWS row on the
  * default HDFS-backed provider as the classic baseline. Each workload
  * runs one untimed warmup feed (codegen + state-store init) before
  * its timed feed — the numbers are steady-state micro-batch
  * throughput, not first-batch compilation. A second, LARGE-batch
  * point (default 4 batches) rides along under "large_batch": small
  * batches measure micro-batch machinery (~0.8 s fixed per batch),
  * so the kernel-throughput regression signal lives here.
  *
  * MemoryStream feeds from the driver by design: the measured path is
  * the stream (shuffle to keyed state, state round-trip, sink), and a
  * file/kafka source would add a second variable. Sink is the noop-
  * equivalent memory sink; row counts are cross-checked so a silently
  * empty stream cannot flatter the numbers.
  */
object StreamBench {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val conf = AnomalyzerConf(
    sensitivity = 0.1, upperBound = 100, lowerBound = Some(0),
    activeSize = 1, nSeasons = 4,
    methods = Seq("magnitude", "fence", "cdf", "highrank"), permCount = 50)

  case class Run(rows: Long, wallSec: Double, stateRows: Long,
      stateBytes: Long, probe: Double = -1.0, diskProbe: Double = -1.0) {
    def rowsPerSec: Double = if (wallSec > 0) rows / wallSec else -1.0
    def json: String =
      f"""{"rows":$rows,"wall_sec":$wallSec%.3f,""" +
        f""""rows_per_sec":${rowsPerSec.toLong},""" +
        s""""state_rows":$stateRows,"state_bytes":$stateBytes""" +
        (if (probe > 0) f""","probe_sec":$probe%.3f""" else "") +
        (if (diskProbe > 0) f""","disk_probe_sec":$diskProbe%.3f"""
         else "") + "}"
  }

  private var sinkN = 0

  /** Feeds `batches` through `build` as a micro-batch stream and times
    * the whole feed (addData + processAllAvailable per batch).
    */
  private def runStream[I: Encoder, O](spark: SparkSession,
      batches: Seq[Seq[I]], provider: String)(
      build: Dataset[I] => Dataset[O]): Run = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, provider)
    try {
      sinkN += 1
      val name = s"stream_bench_sink_$sinkN"
      val input = MemoryStream[I](spark)
      val q = build(input.toDS()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        batches.foreach { b =>
          input.addData(b)
          q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val st = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
        val outRows = spark.table(name).count()
        // drop the memory sink's accumulated rows — nine feeds
        // (warmups included) would otherwise retain every output row
        // in driver memory for the process lifetime
        spark.catalog.dropTempView(name)
        Run(outRows, wall,
          st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    // the LARGE-batch point (fewer, bigger batches): at the default
    // 5k-row batches the wall is ~0.8 s/batch of micro-batch MACHINERY
    // (keyed-state shuffle + store round-trip + commit), so a kernel
    // regression hides inside it — rows/s scales ~linearly with batch
    // size until the kernel dominates. BASELINE.md names this row the
    // kernel-throughput gate; the batches=20 rows remain the
    // machinery/latency picture.
    val nLarge = sys.env.getOrElse("SPARK_GRAFT_STREAM_LARGE_BATCHES", "4").toInt
    val spark = GraftSession.create(s"local[$cpus]", cpus, "graft-streambench")
    import spark.implicits._

    // ---- detector feed: ts-ordered replay, ~1 000 series
    val pts = spark.read.parquet(s"$sfDir/events.parquet")
      .filter("value > -1e9 AND value < 1e9")
      .selectExpr("concat(event_type, '#', user_id % 200) AS series",
        "ts", "value")
      .orderBy("ts").as[SeriesPoint].collect()
    // the ACTUAL keyed-state cardinality (ADVICE r12: the previous
    // hard-coded 1000 misstates it whenever the corpus changes)
    val nSeries = pts.iterator.map(_.series).toSet.size
    def batched[T](rows: Array[T], n: Int): Seq[Seq[T]] =
      rows.grouped((rows.length + n - 1) / n).map(_.toSeq).toSeq

    // ---- neardup feed: id-ordered docs, synthetic arrival clock
    val docRows = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect()
      .map { case (id, text) =>
        (id, new Timestamp(1700000000000L + id), text) }

    def detector(provider: String, tws: Boolean, batches: Int): Run =
      runStream(spark, batched(pts, batches), provider)(ds =>
        if (tws) StreamingDetector.scoreTws(ds, conf)
        else StreamingDetector.score(ds, conf))
    def neardup(provider: String, tws: Boolean, batches: Int): Run =
      runStream(spark, batched(docRows, batches), provider) { ds =>
        val df = ds.toDF("doc_id", "ts", "text")
        if (tws) StreamingNearDup.bandHitsTws(df)(spark)
        else StreamingNearDup.bandHits(df)(spark)
      }

    // every TIMED feed carries its own ambient probes (VERDICT r13 #3:
    // stream rows were the last measurement class without the calib
    // discipline — the committed r13 neardup_tws batches=20 row was a
    // co-tenant burst adjudicable only via an uncommitted re-run).
    // TWO probes, because the feeds bind on two different resources:
    // the CPU probe (probe_sec vs probe_ref) and a disk-COMMIT
    // latency probe (disk_probe_sec vs disk_ref) — RocksDB commits
    // are fsync-bound, and a co-tenant DISK burst is invisible to the
    // CPU probe (measured r14: a 5x-slow neardup feed carried a clean
    // 0.98 s CPU probe while the device sat at 35-57% io_util on
    // ~1 MB/s of our own writes). Both run immediately before the
    // feed and are recorded in the row's JSON, so a burst-hit row is
    // identifiable IN the artifact, by resource.
    def probed(r: => Run): Run = {
      val p = AmbientProbe.onceOrRef(spark, cpus) // probe BEFORE the feed
      val dp = AmbientProbe.diskOnce()
      r.copy(probe = p, diskProbe = dp)
    }

    // warmup feed per workload+backend (codegen, state-provider init),
    // then the timed feed on a fresh query — the HDFS-backed row warms
    // its own provider so all three detector rows are comparable
    val Hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    detector(RocksDb, tws = false, nBatches)
    detector(RocksDb, tws = true, nBatches)
    detector(Hdfs, tws = false, nBatches)
    val detFmgwsHdfs = probed(detector(Hdfs, tws = false, nBatches))
    val detFmgws = probed(detector(RocksDb, tws = false, nBatches))
    val detTws = probed(detector(RocksDb, tws = true, nBatches))
    neardup(RocksDb, tws = false, nBatches)
    neardup(RocksDb, tws = true, nBatches)
    val ndFmgws = probed(neardup(RocksDb, tws = false, nBatches))
    val ndTws = probed(neardup(RocksDb, tws = true, nBatches))
    // large-batch point: state providers already warm from the rows
    // above; one timed feed per workload + API on the RocksDB store
    val detFmgwsL = probed(detector(RocksDb, tws = false, nLarge))
    val detTwsL = probed(detector(RocksDb, tws = true, nLarge))
    val ndFmgwsL = probed(neardup(RocksDb, tws = false, nLarge))
    val ndTwsL = probed(neardup(RocksDb, tws = true, nLarge))

    require(detFmgws.rows == pts.length && detTws.rows == pts.length &&
      detFmgwsL.rows == pts.length && detTwsL.rows == pts.length,
      s"detector row mismatch: ${detFmgws.rows}/${detTws.rows}/" +
        s"${detFmgwsL.rows}/${detTwsL.rows} vs ${pts.length}")
    require(ndFmgws.rows == ndTws.rows && ndFmgws.rows > 0 &&
      ndFmgwsL.rows == ndFmgws.rows && ndTwsL.rows == ndFmgws.rows,
      s"neardup row mismatch: ${ndFmgws.rows}/${ndTws.rows}/" +
        s"${ndFmgwsL.rows}/${ndTwsL.rows}")

    println(s"""{"metric":"stream_rows_per_sec",""" +
      s""""value":${detTws.rowsPerSec.toLong},"unit":"rows/s",""" +
      s""""batches":$nBatches,"series":$nSeries,""" +
      s""""probe_ref":${AmbientProbe.ref},""" +
      s""""disk_ref":${AmbientProbe.diskRef},""" +
      s""""detector_fmgws_hdfs":${detFmgwsHdfs.json},""" +
      s""""detector_fmgws_rocksdb":${detFmgws.json},""" +
      s""""detector_tws_rocksdb":${detTws.json},""" +
      s""""neardup_fmgws_rocksdb":${ndFmgws.json},""" +
      s""""neardup_tws_rocksdb":${ndTws.json},""" +
      s""""large_batch":{"batches":$nLarge,""" +
      s""""detector_fmgws_rocksdb":${detFmgwsL.json},""" +
      s""""detector_tws_rocksdb":${detTwsL.json},""" +
      s""""neardup_fmgws_rocksdb":${ndFmgwsL.json},""" +
      s""""neardup_tws_rocksdb":${ndTwsL.json}},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
