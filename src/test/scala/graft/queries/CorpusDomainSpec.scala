package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Corpus-domain audit: the ingestion contracts (`Tables.events`'
  * |value| < 1e9 range, `Pipeline.embs`' finite |x| < 100 vectors) and
  * the oracle-side conventions that assume them must be NO-OPS on
  * every shipped corpus SF. The DuckDB oracles read the RAW parquet
  * tables, so an out-of-domain row in a future corpus would otherwise
  * surface as a silent Spark-vs-oracle divergence; this spec turns it
  * into a loud, named failure at build time instead.
  */
class CorpusDomainSpec extends AnyFunSuite with SparkTestBase {

  private val allSfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  test("events domain filter is a no-op on every shipped SF " +
    "(oracles read the raw table)") {
    allSfDirs.foreach { dir =>
      val raw = spark.read.parquet(s"$dir/events.parquet").count()
      val kept = Tables.events(spark, dir).count()
      assert(kept === raw,
        s"$dir: ${raw - kept} events rows fall outside |value| < 1e9 — " +
          "mirror the domain filter into the oracle CTEs or regenerate " +
          "the corpus")
    }
  }

  test("embedding domain filter is a no-op on every shipped SF " +
    "(oracles read the raw table)") {
    allSfDirs.foreach { dir =>
      val raw = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val kept = Pipeline.embs(spark, dir).count()
      assert(kept === raw,
        s"$dir: ${raw - kept} embedding rows have null/non-finite/" +
          "|x| >= 100 components — mirror the filter into the oracle " +
          "CTEs or regenerate the corpus")
    }
  }

  test("no zero metric values at the ORACLE SF — the bootstrap/rank " +
    "oracles' |relDiff| zero-divisor CASE must stay a no-op") {
    // the kernel keeps full IEEE semantics at a zero divisor while the
    // a07/a09 oracle SQL uses a defined CASE convention; they agree
    // exactly BECAUSE the driver's oracle corpus (sf0.01, and the
    // sf0.001 test corpus) contains no zero values. sf0.1 does contain
    // zeros — it is bench-only, never oracle-compared.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val zeros = Tables.events(spark, dir)
        .filter(col("value") === 0.0).count()
      assert(zeros === 0L,
        s"$dir: $zeros zero-valued events rows — the a07/a09 oracle " +
          "zero-divisor convention would diverge from the kernel's " +
          "IEEE semantics on these rows")
    }
  }
}
