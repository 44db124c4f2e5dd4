package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WindowedRollupSpec extends AnyFunSuite with SparkTestBase {

  private def pt(s: String, sec: Long, v: Double) =
    SeriesPoint(s, new Timestamp(sec * 1000), v)

  test("tumbling rollup emits per-window means; watermark drops late data") {
    val sparkSession = spark
    import sparkSession.implicits._

    val input = MemoryStream[SeriesPoint](sparkSession)
    val query = WindowedRollup.rollup(input.toDS(), "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("rollup_sink")
      .outputMode("append").start()
    try {
      // window [0,10): 1.0, 3.0 ; window [10,20): 10.0
      input.addData(pt("cpu", 1, 1.0), pt("cpu", 9, 3.0), pt("cpu", 12, 10.0))
      query.processAllAvailable()
      // advance event time far past watermark so [0,10) and [10,20) close
      input.addData(pt("cpu", 40, 7.0))
      query.processAllAvailable()
      // this event is older than watermark (40s - 5s): must be DROPPED,
      // not create/extend a closed window
      input.addData(pt("cpu", 2, 100.0))
      query.processAllAvailable()
      // close everything remaining
      input.addData(pt("cpu", 80, 1.0))
      query.processAllAvailable()

      val got = spark.table("rollup_sink").as[SeriesPoint].collect()
        .map(p => p.ts.getTime / 1000 -> p.value).toMap
      assert(got(10L) === 2.0) // mean(1.0, 3.0), stamped at window end
      assert(got(20L) === 10.0)
      assert(got(50L) === 7.0) // late 100.0 did NOT perturb any window
      assert(!got.values.exists(_ > 50.0))
    } finally query.stop()
  }

  test("rollup feeds the detector: batch equivalence of the composition") {
    val sparkSession = spark
    import sparkSession.implicits._
    // batch-mode check of the same pipeline shape: events -> 10s rollup
    // series -> the windowed mean values are what the detector scores
    val pts = Seq(
      pt("cpu", 1, 1.0), pt("cpu", 5, 3.0), pt("cpu", 11, 4.0),
      pt("cpu", 15, 6.0), pt("cpu", 21, 5.0)).toDS()
    val rolled = pts.toDF()
      .groupBy(org.apache.spark.sql.functions.col("series"),
        org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "10 seconds"))
      .agg(org.apache.spark.sql.functions.avg("value").as("value"))
      .select(org.apache.spark.sql.functions.col("series"),
        org.apache.spark.sql.functions.col("window.end").as("ts"),
        org.apache.spark.sql.functions.col("value"))
      .as[SeriesPoint].collect().sortBy(_.ts.getTime)
    assert(rolled.map(_.value).toSeq === Seq(2.0, 5.0, 5.0))
  }
}
