package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.kernel.{Anomalyzer, AnomalyzerConf}

class StreamingDetectorSpec extends AnyFunSuite with SparkTestBase {

  private val conf = AnomalyzerConf(
    sensitivity = 0.1, upperBound = 100, lowerBound = Some(0),
    activeSize = 1, nSeasons = 4,
    methods = Seq("magnitude", "fence", "cdf", "highrank"), permCount = 50)

  private def pt(s: String, t: Long, v: Double) =
    SeriesPoint(s, new Timestamp(t), v)

  test("streaming scores == sequential kernel across micro-batches") {
    val sparkSession = spark
    import sparkSession.implicits._

    val input = MemoryStream[SeriesPoint](sparkSession)
    val scores = StreamingDetector.score(input.toDS(), conf)
    val query = scores.writeStream
      .format("memory").queryName("scores_sink")
      .outputMode("append").start()
    try {
      // batch 1: interleaved series, deliberately out of ts order
      input.addData(
        pt("cpu", 3000, 2.0), pt("cpu", 1000, 1.0), pt("cpu", 2000, 1.5),
        pt("mem", 1000, 10.0), pt("mem", 2000, 11.0))
      query.processAllAvailable()
      // batch 2: state must carry over (cpu buffer already has 3 points)
      input.addData(
        pt("cpu", 4000, 1.8), pt("cpu", 5000, 9.0),
        pt("mem", 3000, 55.0))
      query.processAllAvailable()

      val got = spark.table("scores_sink").as[AnomalyScore].collect()
        .map(a => (a.series, a.ts.getTime) -> a.prob).toMap
      assert(got.size === 8)

      // oracle: the sequential kernel facade, same seeds
      val expected = Seq(
        "cpu" -> Seq((1000L, 1.0), (2000L, 1.5), (3000L, 2.0),
          (4000L, 1.8), (5000L, 9.0)),
        "mem" -> Seq((1000L, 10.0), (2000L, 11.0), (3000L, 55.0)))
      expected.foreach { case (series, pts) =>
        val a = new Anomalyzer(conf, StreamingDetector.seriesHash(series))
        pts.foreach { case (t, v) =>
          val prob = a.push(v)
          assert(got((series, t)) === prob,
            s"series=$series ts=$t: streaming=${got((series, t))} kernel=$prob")
        }
      }
      // the spike at the end should actually alarm
      assert(got(("mem", 3000L)) > 0.8)
    } finally query.stop()
  }

  test("transformWithState backend == flatMapGroupsWithState backend") {
    val sparkSession = spark
    import sparkSession.implicits._
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    // the transformWithState API requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[SeriesPoint](sparkSession)
    val query = StreamingDetector.scoreTws(input.toDS(), conf)
      .writeStream.format("memory").queryName("tws_sink")
      .outputMode("append").start()
    try {
      input.addData(
        pt("cpu", 3000, 2.0), pt("cpu", 1000, 1.0), pt("cpu", 2000, 1.5),
        pt("mem", 1000, 10.0), pt("mem", 2000, 11.0))
      query.processAllAvailable()
      input.addData(
        pt("cpu", 4000, 1.8), pt("cpu", 5000, 9.0), pt("mem", 3000, 55.0))
      query.processAllAvailable()
      val got = spark.table("tws_sink").as[AnomalyScore].collect()
        .map(a => (a.series, a.ts.getTime) -> a.prob).toMap
      assert(got.size === 8)
      // same per-point probabilities as the sequential kernel (and thus
      // as the flatMapGroupsWithState path, pinned above)
      val expected = Seq(
        "cpu" -> Seq((1000L, 1.0), (2000L, 1.5), (3000L, 2.0),
          (4000L, 1.8), (5000L, 9.0)),
        "mem" -> Seq((1000L, 10.0), (2000L, 11.0), (3000L, 55.0)))
      expected.foreach { case (series, pts) =>
        val a = new Anomalyzer(conf, StreamingDetector.seriesHash(series))
        pts.foreach { case (t, v) =>
          val prob = a.push(v)
          assert(got((series, t)) === prob,
            s"series=$series ts=$t: tws=${got((series, t))} kernel=$prob")
        }
      }
    } finally {
      query.stop()
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state buffer is bounded at windowSize") {
    val sparkSession = spark
    import sparkSession.implicits._
    val input = MemoryStream[SeriesPoint](sparkSession)
    val query = StreamingDetector.score(input.toDS(), conf).writeStream
      .format("memory").queryName("bounded_sink")
      .outputMode("append").start()
    try {
      input.addData((1 to 60).map(i => pt("s", i * 1000L, i.toDouble)): _*)
      query.processAllAvailable()
      val n = spark.table("bounded_sink").count()
      assert(n === 60) // one score per arriving point
      // oracle equality after 60 points proves the buffer truncated the
      // same way the kernel does (windowSize = 5)
      val a = new Anomalyzer(conf, StreamingDetector.seriesHash("s"))
      val expected = (1 to 60).map(i => a.push(i.toDouble))
      val got = spark.table("bounded_sink").as[AnomalyScore].collect()
        .sortBy(_.ts.getTime).map(_.prob)
      assert(got.toSeq === expected)
    } finally query.stop()
  }
}
