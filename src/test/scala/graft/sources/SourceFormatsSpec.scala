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

  test("jdbc round-trip: a dimension lives in an embedded Derby " +
    "database, reads back losslessly, and the filter reaches the " +
    "remote scan") {
    val db = java.nio.file.Files.createTempDirectory("graft-derby")
    val url = s"jdbc:derby:$db/dim;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val base = Tables.table(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    // explicit VARCHARs: Spark's Derby dialect maps StringType to CLOB,
    // which Derby refuses to compare/push predicates against
    base.write.mode("overwrite")
      .option("createTableColumnTypes",
        "n_name VARCHAR(64)")
      .jdbc(url, "nation_dim", props)
    val back = spark.read.jdbc(url, "nation_dim", props)
    // type-width-agnostic compare: Derby's INTEGER/BIGINT choice for
    // the key columns must not change the values
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Number](0).longValue, r.getString(1),
        r.getAs[Number](2).longValue)).sortBy(_._1).toSeq
    assert(rows(back) === rows(base.toDF()))
    // predicate pushdown INTO the JDBC query — at scale the database
    // filters, not Spark
    val p = back.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:") && p.contains("n_regionkey"),
      "JDBC scan must push the filter to the database:\n" + p)
    // and the dim joins back to the corpus like any other source
    val joined = Tables.table(spark, sfDir, "customer")
      .join(broadcast(back), col("c_nationkey") === col("n_nationkey"))
    assert(joined.count() === Tables.table(spark, sfDir, "customer").count())
  }
}
