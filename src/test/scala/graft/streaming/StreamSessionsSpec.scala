package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

case class SessEvent(user_id: Long, ts: Timestamp, value: Double)

class StreamSessionsSpec extends AnyFunSuite with SparkTestBase {

  private def ev(u: Long, t: Long, v: Double) =
    SessEvent(u, new Timestamp(t), v)

  private val min = 60L * 1000

  test("sessions close at the gap, survive micro-batch splits, " +
    "and == the batch session_window aggregate") {
    val sparkSession = spark
    import sparkSession.implicits._

    // u1: two sessions (0-6m with 3 events, 30-31m with 2); u2: one
    val evs = Seq(
      ev(1, 0, 1.25), ev(1, 3 * min, 2.5), ev(1, 6 * min, 0.125),
      ev(1, 30 * min, 4.0), ev(1, 31 * min, 1.0),
      ev(2, 5 * min, 7.75))
    // sentinel far in the future: advances the watermark past every
    // real session's end + gap so they all emit in append mode; its own
    // session stays open and never appears in the sink
    val sentinel = ev(99, 10000 * min, 0.0)

    val in = MemoryStream[SessEvent](sparkSession)
    val query = StreamSessions.sessions(in.toDF(), "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    try {
      // split mid-session across micro-batches: the 0-6m session's
      // last event arrives in batch 2 and must merge into open state
      in.addData(evs.take(2): _*)
      query.processAllAvailable()
      in.addData(evs.drop(2): _*)
      query.processAllAvailable()
      in.addData(sentinel)
      query.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getLong(4))
      val streaming = spark.table("sess_sink").collect().map(key).toSet
      val batch = StreamSessions
        .sessions(evs.toDF(), "10 minutes", "0 seconds")
        .collect().map(key).toSet

      assert(streaming === batch)
      assert(streaming.size === 3, s"expected 3 closed sessions: $streaming")
      val u1First = streaming.find(s => s._1 == 1L &&
        s._2 == new Timestamp(0)).get
      assert(u1First._4 === 3L && u1First._5 === 3875000L,
        "3 events, exact micro-sum of 1.25+2.5+0.125")
    } finally query.stop()
  }
}
