package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextIngestSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    val p = dir.resolve(name)
    Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
    p.toString
  }

  test("jsonl ingest: contract rows pass, malformed and " +
    "missing-required rows quarantine with reason codes; " +
    "no row is silently dropped") {
    val path = write("docs.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """{"doc_id": 3, "lang": "en"}""",
      """{"doc_id": null, "text": "orphan", "lang": "en"}""",
      """{"doc_id": "not-a-number", "text": "bad type", "lang": "en"}""",
      """{broken json""",
      """{"doc_id": 4, "text": "extra is fine", "lang": "de", "x": 9}"""))
    val ing = TextIngest.jsonl(spark, path, schema,
      required = Seq("doc_id", "text"))

    val good = ing.good.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(good === Array((1L, "hello world", "en"), (2L, "bonjour", "fr"),
      (4L, "extra is fine", "de")))
    assert(ing.good.columns.toSeq === Seq("doc_id", "text", "lang"),
      "good side must carry exactly the declared schema")

    val quar = ing.quarantine.collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(quar.length === 4)
    val reasons = quar.map(_._2).sorted
    assert(reasons === Array("malformed_record", "malformed_record",
      "missing_required:doc_id", "missing_required:text"))
    // conservation: every input line is accounted for exactly once
    assert(good.length + quar.length === 7)
    // the raw record survives quarantine for replay/debugging
    assert(quar.exists(_._1.contains("broken json")))
    assert(quar.exists(_._1.contains("orphan")))
  }

  test("streaming jsonl ingest == batch ingest over the same files; " +
    "quarantine rides the stream with the same reason codes") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-ingest-stream")
    Files.write(dir.resolve("a.jsonl"), Seq(
      """{"doc_id": 1, "text": "hello", "lang": "en"}""",
      """{"doc_id": 2, "lang": "en"}""",
      """{not json""").mkString("\n").getBytes("UTF-8"))
    Files.write(dir.resolve("b.jsonl"), Seq(
      """{"doc_id": 3, "text": "welt", "lang": "de"}""",
      """{"doc_id": null, "text": "orphan", "lang": "en"}""")
      .mkString("\n").getBytes("UTF-8"))

    val ing = TextIngest.jsonlStream(spark, dir.toString, schema,
      required = Seq("doc_id", "text"))
    val qGood = ing.good.writeStream.format("memory")
      .queryName("ing_good").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    val qQuar = ing.quarantine.writeStream.format("memory")
      .queryName("ing_quar").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    qGood.awaitTermination()
    qQuar.awaitTermination()

    val batch = TextIngest.jsonl(spark, dir.toString, schema,
      required = Seq("doc_id", "text"))
    def goodRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    def quarRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(goodRows(spark.table("ing_good")) === goodRows(batch.good))
    assert(quarRows(spark.table("ing_quar")) ===
      quarRows(batch.quarantine))
    assert(spark.table("ing_good").count() +
      spark.table("ing_quar").count() === 5, "conservation across files")
  }

  test("csv ingest: header honored, type-mismatch and short rows " +
    "quarantine, required-null reasons name the first violated field") {
    val path = write("docs.csv", Seq(
      "doc_id,text,lang",
      "1,hello,en",
      "2,bonjour,fr",
      "oops,bad id,en",
      "3,,en",
      "4,ok,"))
    val ing = TextIngest.csv(spark, path, schema,
      required = Seq("doc_id", "text"))
    val good = ing.good.collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).sorted
    // lang is NOT required: row 4's empty lang stays good with null
    assert(good === Array((1L, "hello", Some("en")),
      (2L, "bonjour", Some("fr")), (4L, "ok", None)))
    val quar = ing.quarantine.collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    assert(quar.map(_._2).toSeq ===
      Seq("malformed_record", "missing_required:text"))
    assert(good.length + quar.length === 5)
    // faithful raw: the missing-text row renders its null as an EMPTY
    // CELL, keeping the original column count (concat_ws alone would
    // collapse '3,,en' to '3,en' and mislead quarantine replay)
    val missingText = quar.find(_._2 == "missing_required:text").get._1
    assert(missingText === "3,,en",
      s"quarantine raw must preserve column positions, got '$missingText'")
  }

  test("quarantine raw keeps explicit nulls: a required-null json row " +
    "re-renders with the null field present, not silently dropped") {
    val path = write("nulls.jsonl", Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en"}""",
      """{"doc_id": null, "text": "orphan", "lang": "en"}"""))
    val ing = TextIngest.jsonl(spark, path, schema,
      required = Seq("doc_id", "text"))
    val raw = ing.quarantine.collect().map(r => r.getString(0))
    assert(raw.length === 1 && raw.head.contains("\"doc_id\":null"),
      s"null required field must survive re-render, got ${raw.toSeq}")
  }
}
