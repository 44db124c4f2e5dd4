package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Source-format coverage: the engine is parquet-first (the corpus),
  * but CSV and JSON land the same rows with an explicit schema — no
  * inference pass, which at 100 TB would mean reading the data twice.
  */
class SourceFormatsSpec extends AnyFunSuite with SparkTestBase {

  test("csv and json round-trip the events slice losslessly") {
    val base = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
      .filter(col("event_id") < 200)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-src")

    base.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/events_csv")
    base.write.mode("overwrite").json(s"$tmp/events_json")

    val fromCsv = spark.read.schema(schema).option("header", "true")
      .csv(s"$tmp/events_csv")
    val fromJson = spark.read.schema(schema).json(s"$tmp/events_json")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).sortBy(_._1).toSeq

    val expected = rows(base.toDF())
    assert(expected.nonEmpty)
    assert(rows(fromCsv) === expected)
    assert(rows(fromJson) === expected)
  }

  test("orc round-trips losslessly and pushes filters into the scan") {
    val base = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc")
    base.write.mode("overwrite").orc(s"$tmp/events_orc")

    val back = spark.read.orc(s"$tmp/events_orc")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4))).sortBy(_._1).toSeq
    val expected = rows(base.toDF())
    assert(expected.nonEmpty)
    assert(rows(back) === expected)

    // the columnar scan must receive the predicate, same as parquet —
    // a full-scan-then-filter ORC reader would be wrong at 100 TB
    val p = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), " +
      "EqualTo(event_type,click)]"),
      "ORC scan must push the filter down:\n" + p)
  }
}
