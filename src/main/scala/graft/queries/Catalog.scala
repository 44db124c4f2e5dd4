package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when the
  * semantics are SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against. Column names/aliases MUST match
  * between the two — the comparison sorts columns by name.
  *
  * Determinism discipline for oracle-checked queries:
  *  - money/qty sums: per-row CAST to DECIMAL(18,2), sum exactly, CAST
  *    the total back to DOUBLE (identical in both engines);
  *  - averages/probabilities: IEEE arithmetic in identical expression
  *    order, then round(6);
  *  - any LIMIT carries a total ORDER BY.
  */
final case class Entry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Catalog {
  lazy val all: Seq[Entry] = Relational.entries ++ Anomaly.entries ++ Pipeline.entries

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(e.name -> _)).toMap

  lazy val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
