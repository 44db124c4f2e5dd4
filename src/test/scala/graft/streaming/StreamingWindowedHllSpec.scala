package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingWindowedHllSpec extends AnyFunSuite with SparkTestBase {

  private def eventTokens = spark.read
    .parquet(s"$sfDir/events.parquet")
    .select(col("event_type").as("source"),
      col("ts").cast("timestamp").as("ts"),
      col("user_id").cast("string").as("t"))

  test("windowed HLL registers: stream == batch across micro-batches; " +
    "a row later than the watermark into a closed window is dropped; " +
    "estimates fold per (window, source)") {
    val sparkSession = spark
    import sparkSession.implicits._

    val rows = eventTokens.as[(String, Timestamp, String)].collect()
      .sortBy(_._2.getTime)
    assert(rows.length > 100)
    val cut = rows.length * 2 / 3

    val input = MemoryStream[(String, Timestamp, String)](sparkSession)
    val query = StreamingWindowedHll
      .registers(input.toDF().toDF("source", "ts", "t"),
        "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("whll_sink")
      .outputMode("update").start()
    val late = try {
      input.addData(rows.take(cut).toSeq)
      query.processAllAvailable()
      input.addData(rows.drop(cut).toSeq)
      query.processAllAvailable()
      val before = spark.table("whll_sink").count()
      // a brand-new user into the EARLIEST window, far behind the
      // watermark: the engine must drop it — no new sink rows at all
      input.addData(Seq((rows.head._1, rows.head._2, "zzz-late-user")))
      query.processAllAvailable()
      before === spark.table("whll_sink").count()
    } finally query.stop()
    assert(late, "late row into an evicted window must be dropped")

    val streamed = spark.table("whll_sink")
      .groupBy("win_start", "source", "bucket").agg(max("m").as("m"))
    val batch = StreamingWindowedHll
      .registers(eventTokens, "1 hour", "30 minutes")
    def regRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("win_start").cast("long"), col("source"),
        col("bucket"), col("m")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._2, t._3))
    assert(regRows(streamed) === regRows(batch),
      "streaming windowed registers must converge to the batch build")

    // estimates: every (window, source) estimate within the 3-sigma
    // HLL band of the true windowed distinct-user count
    val est = StreamingWindowedHll.estimate(streamed).collect()
      .map(r => ((r.getTimestamp(0).getTime, r.getString(1)),
        r.getDouble(2))).toMap
    val truth = eventTokens
      .groupBy(window(col("ts"), "1 hour").as("win"), col("source"))
      .agg(countDistinct("t").as("n"))
      .select(col("win.start").cast("long") * 1000, col("source"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(est.keySet === truth.keySet)
    truth.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= 3 * 0.13 * n + 3.0,
        s"$k exact=$n est=${est(k)} outside the HLL band")
    }
  }
}
