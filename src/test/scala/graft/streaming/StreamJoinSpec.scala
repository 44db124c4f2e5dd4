package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

case class JoinEvent(user_id: Long, ts: Timestamp, event_type: String)

class StreamJoinSpec extends AnyFunSuite with SparkTestBase {

  // base well past epoch 0: the initial watermark is epoch 0, and a
  // left row AT the watermark is eviction-boundary-sensitive
  private val base = 1000000000000L
  private def ev(u: Long, t: Long, tp: String) =
    JoinEvent(u, new Timestamp(base + t), tp)

  private val min = 60L * 1000

  test("interval join matches across micro-batches; == batch join") {
    val sparkSession = spark
    import sparkSession.implicits._

    val clicks =
      Seq(ev(1, 0, "click"), ev(1, 30 * min, "click"), ev(2, 0, "click"))
    val buys = Seq(
      ev(1, 5 * min, "buy"),     // within 10m of u1's first click
      ev(1, 36 * min, "buy"),    // within 10m of u1's second click
      ev(2, 20 * min, "buy"),    // too late for u2's click
      ev(3, 1 * min, "buy"))     // no matching user

    val lIn = MemoryStream[JoinEvent](sparkSession)
    val rIn = MemoryStream[JoinEvent](sparkSession)
    val query = StreamJoin
      .followWithin(lIn.toDF(), rIn.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("sj_sink")
      .outputMode("append").start()
    try {
      // left arrives first; matching right rows arrive in LATER
      // micro-batches, so matches require buffered left state
      lIn.addData(clicks: _*)
      query.processAllAvailable()
      rIn.addData(buys.take(2): _*)
      query.processAllAvailable()
      rIn.addData(buys.drop(2): _*)
      query.processAllAvailable()

      val streaming = spark.table("sj_sink")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(3)))
        .toSet
      assert(streaming.forall(_._2.getTime >= base))
      val batch = StreamJoin
        .followWithin(clicks.toDF(), buys.toDF(), "10 minutes", "1 hour")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(3)))
        .toSet

      assert(streaming === batch)
      assert(streaming.map(_._1) === Set(1L), "only user 1 pairs qualify")
      assert(streaming.size === 2)
    } finally query.stop()
  }

  test("left-outer: unmatched left rows emit with nulls once the " +
    "watermark passes; == batch left-outer join") {
    val sparkSession = spark
    import sparkSession.implicits._

    val clicks = Seq(ev(1, 0, "click"), ev(2, 0, "click"))
    val buys = Seq(ev(1, 5 * min, "buy")) // u2's click never matches
    // sentinels on BOTH streams push the global watermark (min of the
    // two inputs) far past l_ts + horizon + delay, forcing the
    // unmatched u2 row to emit; sentinel users are filtered out below
    val sentinelL = ev(98, 10000 * min, "click")
    val sentinelR = ev(99, 10000 * min, "buy")

    val lIn = MemoryStream[JoinEvent](sparkSession)
    val rIn = MemoryStream[JoinEvent](sparkSession)
    val query = StreamJoin
      .followWithinOuter(lIn.toDF(), rIn.toDF(), "10 minutes", "1 minute")
      .writeStream.format("memory").queryName("sjo_sink")
      .outputMode("append").start()
    try {
      lIn.addData(clicks: _*)
      rIn.addData(buys: _*)
      query.processAllAvailable()
      lIn.addData(sentinelL)
      rIn.addData(sentinelR)
      query.processAllAvailable()
      // one more empty-ish cycle lets the engine act on the advanced
      // watermark and flush expired left state
      rIn.addData(ev(99, 10001 * min, "buy"))
      lIn.addData(ev(98, 10001 * min, "click"))
      query.processAllAvailable()

      def rows(df: org.apache.spark.sql.DataFrame) = df
        .filter(org.apache.spark.sql.functions.col("user_id") < 90)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1),
          Option(r.getTimestamp(3))))
        .toSet
      val streaming = rows(spark.table("sjo_sink"))
      val batch = rows(StreamJoin.followWithinOuter(
        clicks.toDF(), buys.toDF(), "10 minutes", "1 minute"))

      assert(streaming === batch)
      assert(streaming.exists(r => r._1 == 2L && r._3.isEmpty),
        "u2's unmatched click must emit with a null right side")
    } finally query.stop()
  }
}
