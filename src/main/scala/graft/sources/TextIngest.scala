package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-contract ingest for the text formats a corpus actually arrives
  * in (JSON-lines and CSV): every row either parses against the
  * DECLARED schema and passes its required-field contract, or lands in
  * a quarantine frame with a reason code — never silently dropped,
  * never silently null-padded. This is the ingest seam in front of the
  * p-series pipeline: the parquet tables the catalog reads are what
  * the GOOD side of this boundary produces.
  *
  * Shape at scale: both readers are Spark's native PERMISSIVE-mode
  * sources — schema applied at scan time (no schema inference pass
  * over 100 TB), malformed rows captured per-partition into the
  * corrupt-record column, and the good/quarantine split is ONE
  * predicate over the scanned frame (the two consumers share the scan
  * under cache, or re-scan cheaply — no shuffle either way). Reason
  * codes are computed with coalesce over the declared required
  * columns, so the quarantine report names the FIRST violated field
  * deterministically.
  */
object TextIngest {

  /** Spark reserves this column name for the raw text of rows that
    * fail to parse in PERMISSIVE mode.
    */
  val CorruptCol = "_corrupt_record"

  /** An ingest result: contract-passing rows (schema columns only) and
    * the quarantine (raw record + reason).
    */
  final case class Ingest(good: DataFrame, quarantine: DataFrame)

  private def reasonCol(required: Seq[String]): Column =
    coalesce(
      (when(col(CorruptCol).isNotNull, lit("malformed_record")) +:
        required.map(f =>
          when(col(f).isNull, lit(s"missing_required:$f")))): _*)

  private def split(
      parsed: DataFrame,
      schema: StructType,
      required: Seq[String],
      raw: Column): Ingest = {
    val withReason = parsed.withColumn("reason", reasonCol(required))
    val good = withReason.filter(col("reason").isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val quarantine = withReason.filter(col("reason").isNotNull)
      .select(raw.as("raw"), col("reason"))
    Ingest(good, quarantine)
  }

  /** JSON-lines ingest: `schema` declares the contract, `required`
    * names the fields that must be present AND non-null. A row is
    * quarantined as `malformed_record` (unparseable JSON / type
    * mismatch) or `missing_required:<field>` (first violated field in
    * declaration order).
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      required: Seq[String]): Ingest = {
    val parsed = spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
    split(parsed, schema, required, jsonRaw(schema))
  }

  /** STREAMING JSON-lines ingest with the same contract semantics —
    * the production shape of the seam: files land in `path`
    * continuously, each micro-batch splits into the same good /
    * quarantine frames (write each with its own sink). The declared
    * schema is what makes this possible at all: a streaming source
    * cannot infer, and the PERMISSIVE corrupt-record capture is
    * per-partition — no coordination, no state, so the gate adds
    * nothing to the stream's shuffle plan. Parity with the batch
    * reader over the same files is pinned by TextIngestSpec.
    */
  def jsonlStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      required: Seq[String]): Ingest = {
    val parsed = spark.readStream
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
    split(parsed, schema, required, jsonRaw(schema))
  }

  /** CSV ingest with the same contract semantics (header expected;
    * a row with the wrong column count or an uncastable cell is
    * `malformed_record`).
    *
    * Quarantine-raw contract limits (CSV only — the corrupt capture
    * is faithful, the fallback RE-RENDER is lossy in two ways):
    * (1) null vs empty-string is not distinguishable — both render
    * as an empty cell, matching Spark's CSV reader which parses an
    * empty cell as null anyway; (2) field values containing commas
    * or quotes are re-rendered unquoted, so a replay consumer must
    * treat the re-rendered form as review material, not a
    * byte-faithful copy of the input line (the corrupt-capture
    * branch, which fires for every parse-failure quarantine, IS
    * byte-faithful).
    */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      required: Seq[String]): Ingest = {
    val parsed = spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
    split(parsed, schema, required,
      coalesce(col(CorruptCol),
        // nulls render as explicit empty cells: concat_ws SKIPS null
        // args, so a row quarantined precisely because a required field
        // is missing would otherwise re-render with FEWER columns than
        // the input ('a,,c' -> 'a,c'), corrupting quarantine review and
        // replay
        concat_ws(",", schema.fieldNames.map(f =>
          coalesce(col(f).cast("string"), lit(""))).toIndexedSeq: _*)))
  }

  /** Raw reconstruction for JSON quarantine rows: the corrupt capture
    * when parsing failed, otherwise a re-render that KEEPS null fields
    * (`"f":null`) — to_json's default drops them, which would make a
    * missing-required quarantine row look like it never had the key at
    * all versus carrying an explicit null.
    */
  private def jsonRaw(schema: StructType): Column =
    coalesce(col(CorruptCol),
      to_json(struct(schema.fieldNames.map(col).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false")))
}
