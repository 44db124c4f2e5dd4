package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Detectors
import graft.queries.{Anomaly, Catalog}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: sliding-window anomaly
    * scoring over the events stream, top anomalies enriched with the
    * customer dimension (scan → shuffle-by-series → window detect →
    * broadcast join → top-k). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val scored = Detectors.withProbsFused(Tables.events(spark, dir),
        col("event_type"), col("ts"), Seq(col("event_id")), col("value"),
        Anomaly.spec)
      .filter(col("rn") >= Anomaly.spec.windowSize)
    scored
      .join(broadcast(Tables.table(spark, dir, "customer")),
        col("user_id") === col("c_custkey"))
      .select("event_id", "event_type", "value", "prob_ensemble",
        "c_name", "c_mktsegment")
      .orderBy(col("prob_ensemble").desc, col("event_id"))
      .limit(50)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash/permutation-based ops
    * (driver records a rows-only check; exact oracles live in ScalaTest).
    */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
