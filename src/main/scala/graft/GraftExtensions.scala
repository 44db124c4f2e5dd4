package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._
import graft.kernel.AnomalyzerConf

/** SQL surface for the engine's custom Catalyst expressions, installed
  * through the standard extension point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or in code:
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * After installation the functions resolve in plain SQL, e.g.
  * `SELECT graft_simhash64(split(text, ' ')) FROM documents` or
  * `SELECT graft_anomaly_prob(w, conv(substr(md5(series),1,15),16,10),
  * rn, 2, 4, 100, 'magnitude,ks')` — the series hash is the md5-60
  * identity every other evaluation path (and the DuckDB draw-replay
  * oracle) derives; an ad-hoc hash would yield valid but
  * path-inconsistent bootstrap p-values.
  * Config-like arguments (window sizes, method list) must be literals —
  * they parameterize the expression at analysis time, mirroring the
  * reference's config-time validation (anomalyze.go:106-118: errors
  * surface at construction, not evaluation).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      try Math.toIntExact(v) catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"$fn: argument '$arg' ($v) overflows an integer")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  private def litString(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a string literal, got $other")
    }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name, usage)

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), builder)

  /** Register every graft function into an already-running session
    * (equivalent to installing the extension at build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.shims.registerFunctions(spark, all)

  /** All injectable (identifier, info, builder) triples. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    fn("graft_simhash64",
      "graft_simhash64(tokens) - 64-bit SimHash of a token array") {
      args => SimHash64(args.head)
    },

    fn("graft_rolling_fingerprint",
      "graft_rolling_fingerprint(tokens) - order-aware rolling hash") {
      args => RollingFingerprint(args.head)
    },

    fn("graft_ngram_hashes",
      "graft_ngram_hashes(tokens, n) - 64-bit hashes of word n-grams") {
      args => NGramHashes(args(0), litInt(args(1), "graft_ngram_hashes", "n"))
    },

    fn("graft_word_ngrams",
      "graft_word_ngrams(tokens, n) - space-joined word n-grams") {
      args => WordNGrams(args(0), litInt(args(1), "graft_word_ngrams", "n"))
    },

    fn("graft_md5_h60_ngrams",
      "graft_md5_h60_ngrams(tokens, n) - 60-bit md5 (HashScheme h60) " +
        "of each space-joined word n-gram; oracle-replayable") {
      args => graft.functions.Md5H60NGrams(args(0),
        litInt(args(1), "graft_md5_h60_ngrams", "n"))
    },

    fn("graft_md5_simhash60",
      "graft_md5_simhash60(tokens) - 60-bit md5-based SimHash " +
        "(HashScheme h60 per token, majority per bit); oracle-replayable") {
      args => graft.functions.Md5SimHash60(args.head)
    },

    fn("graft_minhash",
      "graft_minhash(tokens, ngram, k) - k-permutation MinHash signature") {
      args => MinHashSignature(args(0),
        litInt(args(1), "graft_minhash", "ngram"),
        litInt(args(2), "graft_minhash", "k"))
    },

    fn("graft_kmv_sketch",
      "graft_kmv_sketch(hash, k) - aggregate: k smallest distinct " +
        "hashes, sorted (KMV distinct-count sketch)") {
      args => KmvSketch(args(0), litInt(args(1), "graft_kmv_sketch", "k"))
        .toAggregateExpression()
    },

    fn("graft_cosine_sim",
      "graft_cosine_sim(a, b) - cosine similarity of two double arrays " +
        "(null on length mismatch or null elements)") {
      args => CosineSim(args(0), args(1))
    },

    fn("graft_esd_rounds",
      "graft_esd_rounds(arr, sx, sxx, w, k) - generalized-ESD (Rosner) " +
        "round statistics r1..rk + non-constant flag over a trailing " +
        "window (arr = values, sx = sum, sxx = sum of squares as an " +
        "integer DECIMAL(p,0)). Domain: deviations n*x - sx are " +
        "computed in int64, so |values| must stay within the events " +
        "ingestion contract (|v6| < 1e15 micro) for exact results") {
      args => EsdRounds(args(0), args(1), args(2),
        litInt(args(3), "graft_esd_rounds", "w"),
        litInt(args(4), "graft_esd_rounds", "k"))
    },

    fn("graft_cosine_lsh_bucket",
      "graft_cosine_lsh_bucket(emb, nBits, seed) - hyperplane-LSH " +
        "bucket id of an embedding") {
      args => CosineLshBucket(args(0),
        litInt(args(1), "graft_cosine_lsh_bucket", "nBits"),
        litInt(args(2), "graft_cosine_lsh_bucket", "seed").toLong)
    },

    fn("graft_iln6",
      "graft_iln6(n) - round-to-micro natural log of BIGINT n >= 1 in " +
        "pure integer arithmetic (no libm): reproducible across " +
        "engines, partitionings, and platforms; NULL for n < 1") {
      args => Iln6(args.head)
    },

    fn("graft_md5_minhash",
      "graft_md5_minhash(shingles) - cross-engine md5 MinHash " +
        "signature (64 perms) of a shingle array; empty signature for " +
        "an empty array") {
      args => Md5MinHash(args.head)
    },

    fn("graft_mann_kendall_stats",
      "graft_mann_kendall_stats(arr) - STRUCT(s_stat, tie_term) of a " +
        "micro-fixed BIGINT window: s_stat = sum of pair signs, " +
        "tie_term = sum of t(t-1)(2t+5) over tied groups") {
      args => MannKendallStats(args.head)
    },

    fn("graft_scaled_l1_dist",
      "graft_scaled_l1_dist(a, b, diff, scale) - sum of " +
        "|scale*(a_i - b_i) - diff| over two equal-length BIGINT " +
        "windows (the mean-centered Manhattan profile distance)") {
      args => ScaledL1Dist(args(0), args(1), args(2),
        litInt(args(3), "graft_scaled_l1_dist", "scale"))
    },

    fn("graft_theil_sen_median_slope",
      "graft_theil_sen_median_slope(arr) - median of all pairwise " +
        "slopes (x_j - x_i)/(j - i) of a BIGINT window; NULL below " +
        "two points") {
      args => TheilSenMedianSlope(args.head)
    },

    fn("graft_double_rank_sum",
      "graft_double_rank_sum(sub, full) - strict-less rank sum: for " +
        "each x in sub, count of y in full with y < x, summed") {
      args => DoubleRankSum(args(0), args(1))
    },

    fn("graft_ks_grid_stat_num",
      "graft_ks_grid_stat_num(arr, n1, n2) - exact integer KS grid " +
        "statistic numerator over a cumulative-fold linspace of the " +
        "(n1+n2)-point window (ref = first n1, active = last n2); " +
        "NULL unless the window holds exactly n1+n2 points") {
      args => KsGridStatNum(args(0),
        litInt(args(1), "graft_ks_grid_stat_num", "n1"),
        litInt(args(2), "graft_ks_grid_stat_num", "n2"))
    },

    fn("graft_rademacher_lsh_bucket",
      "graft_rademacher_lsh_bucket(ei, table, bits) - hyperplane-LSH " +
        "bucket id of a micro-fixed BIGINT embedding under the " +
        "integer Rademacher sign scheme (oracle-replayable)") {
      args => RademacherLshBucket(args(0),
        litInt(args(1), "graft_rademacher_lsh_bucket", "table"),
        litInt(args(2), "graft_rademacher_lsh_bucket", "bits"))
    },

    fn("graft_int_sq_l2",
      "graft_int_sq_l2(a, b) - exact integer squared-L2 distance " +
        "sum((a_i - b_i)^2) of two BIGINT arrays; NULL on length mismatch") {
      args => IntSqL2(args(0), args(1))
    },

    fn("graft_int_dot",
      "graft_int_dot(a, b) - exact integer dot product of two BIGINT " +
        "arrays; NULL on length mismatch") {
      args => IntDot(args(0), args(1))
    },

    fn("graft_int_eq_count",
      "graft_int_eq_count(a, b) - positionwise agreement count of two " +
        "BIGINT arrays; NULL on length mismatch") {
      args => IntEqCount(args(0), args(1))
    },

    fn("graft_winnow_fingerprints",
      "graft_winnow_fingerprints(gs, w) - winnowing fingerprint " +
        "selection over a nonnegative int64 gram-hash stream: distinct " +
        "STRUCT(pos, fp) records in first-occurrence order, rightmost " +
        "minimal gram per length-w window; empty for streams shorter " +
        "than w") {
      args => graft.functions.WinnowFingerprints(args(0),
        litInt(args(1), "graft_winnow_fingerprints", "w"))
    },

    fn("graft_cusum_max_abs",
      "graft_cusum_max_abs(arr) - CUSUM range numerator of an int64 " +
        "window: max_j |n*S_j - j*S_n| over prefix sums; NULL for " +
        "windows shorter than 2") {
      args => graft.functions.CusumMaxAbs(args.head)
    },

    fn("graft_double_dot",
      "graft_double_dot(a, b) - dot product of two DOUBLE arrays in " +
        "one pass (the pair half of graft_cosine_sim for callers that " +
        "precompute per-row norms); NULL on length mismatch or null " +
        "elements") {
      args => graft.functions.DoubleDot(args(0), args(1))
    },

    fn("graft_robust_window_stats",
      "graft_robust_window_stats(arr, mid, q1i, q3i) - " +
        "STRUCT(med, mad, q1, q3) of a DOUBLE window array in one " +
        "pass: med/q1/q3 are the 1-based order statistics of " +
        "array_sort(arr) (array_sort's exact stable ordering), mad the " +
        "mid-th order statistic of |x - med|; NULL when the window is " +
        "shorter than a requested index") {
      args => graft.functions.RobustWindowStats(args(0),
        litInt(args(1), "graft_robust_window_stats", "mid"),
        litInt(args(2), "graft_robust_window_stats", "q1i"),
        litInt(args(3), "graft_robust_window_stats", "q3i"))
    },

    fn("graft_bm25_c6",
      "graft_bm25_c6(idf6, tf, dl, a_toks, n_docs) - exact 128-bit " +
        "BM25 term contribution in micro units: (idf6*22*tf*a_toks + " +
        "den div 2) div den with den = 10*tf*a_toks + 3*a_toks + " +
        "9*dl*n_docs; all operands nonnegative BIGINTs") {
      args => Bm25Contrib(args(0), args(1), args(2), args(3), args(4))
    },

    fn("graft_anomaly_prob",
      "graft_anomaly_prob(window, seriesHash, rowKey, activeSize, " +
        "nSeasons, permCount, methodsCsv) - ensemble anomaly probability") {
      args =>
        val conf = AnomalyzerConf(
          activeSize = litInt(args(3), "graft_anomaly_prob", "activeSize"),
          nSeasons = litInt(args(4), "graft_anomaly_prob", "nSeasons"),
          permCount = litInt(args(5), "graft_anomaly_prob", "permCount"),
          methods = litString(args(6), "graft_anomaly_prob", "methodsCsv")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        AnomalyProb(args(0), args(1), args(2), AnomalyzerConf.validated(conf))
    })
}
