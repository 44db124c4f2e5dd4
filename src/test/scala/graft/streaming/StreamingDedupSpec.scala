package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

case class DedupDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  private def doc(id: Long, t: Long, text: String) =
    DedupDoc(id, new Timestamp(t), text)

  test("first arrival per normalized content survives; dups within " +
    "the watermark horizon are dropped across micro-batches") {
    val sparkSession = spark
    import sparkSession.implicits._

    val input = MemoryStream[DedupDoc](sparkSession)
    val out = StreamingDedup.firstArrivals(input.toDF(), "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      // batch 1: b is an exact dup of a (same text modulo whitespace/
      // case, which the normalization collapses); c is distinct
      input.addData(
        doc(1, 1000, "The quick brown fox"),
        doc(2, 2000, "  the   QUICK brown fox "),
        doc(3, 3000, "something else entirely"))
      query.processAllAvailable()
      // batch 2: another dup of a arriving in a LATER micro-batch must
      // still be suppressed (state carries over); one new distinct doc
      input.addData(
        doc(4, 4000, "the quick brown fox"),
        doc(5, 5000, "fresh content"))
      query.processAllAvailable()

      val survivors = spark.table("dedup_sink")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(survivors === Set(1L, 3L, 5L),
        s"expected first arrivals only, got $survivors")
    } finally query.stop()
  }

  test("streaming survivors == batch keep-first on the same data") {
    val sparkSession = spark
    import sparkSession.implicits._
    val docs = Seq(
      doc(10, 1000, "alpha beta gamma"),
      doc(11, 1500, "ALPHA beta   gamma"),
      doc(12, 2000, "delta epsilon"),
      doc(13, 2500, "alpha beta gamma"),
      doc(14, 3000, "zeta"))

    val input = MemoryStream[DedupDoc](sparkSession)
    val query = StreamingDedup.firstArrivals(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_parity_sink")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val streaming = spark.table("dedup_parity_sink")
        .select("doc_id").collect().map(_.getLong(0)).toSet

      // batch keep-first: min doc_id per normalized-content hash (ids
      // here arrive in ts order, so first arrival = min id)
      val batch = docs.toDF()
        .withColumn("h", org.apache.spark.sql.functions.expr(
          graft.functions.HashScheme.h60Spark(
            "lower(regexp_replace(trim(text), '\\\\s+', ' '))")))
        .groupBy("h")
        .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streaming === batch)
    } finally query.stop()
  }
}
