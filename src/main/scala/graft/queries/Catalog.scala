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

  // ListMap: iteration (and thus Verify's run order and timings.json)
  // follows catalog declaration order. A plain .toMap hash-scrambles
  // it, so which entry ran first — and absorbed the fresh-JVM warmup
  // into its recorded wall-time budget — was arbitrary per build.
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(all.map(e => e.name -> e.run): _*)

  lazy val oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      all.flatMap(e => e.oracle.map(e.name -> _)): _*)

  lazy val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
