package graft.kernel

/** Deterministic fixed-point natural log of a positive integer —
  * micro-units, NO libm: the one primitive that lets a log-likelihood
  * score (p41) be bit-identical across engines at any scale. The
  * round(1e6·ln(x)) formulation both engines previously computed
  * through their own libm ln() diverges by one micro-unit whenever the
  * true value sits within an ulp of a .5 boundary (~1 in 1e5 terms —
  * observed once in the sf0.1 sweep); this algorithm is pure integer
  * arithmetic, so Spark, DuckDB, and this Scala mirror produce the
  * SAME integer by construction, boundaries included.
  *
  * Algorithm (all floor divisions on nonnegative operands, so
  * truncate-toward-zero and floor agree — the property that makes
  * Spark's `div` and DuckDB's `//` interchangeable):
  *   b  = bitlen(n) − 1,  p = 2^b  (so n/p ∈ [1, 2))
  *   u  = floor(S·(n − p) / (n + p))   with S = 2^31; u ∈ [0, S/3)
  *   ln(n/p) = 2·atanh((n−p)/(n+p)) ≈ 2·(u + u³/3 + u⁵/5 + u⁷/7
  *             + u⁹/9 + u¹¹/11) / S   (u ≤ 1/3 ⇒ the dropped u¹³
  *             term is < 1e-7 — far below the half-micro threshold;
  *             u¹¹ itself is ~0.9µ at u ≈ 1/3 and must be kept)
  *   lnS = b·round(S·ln2) + 2·series   (scale S, nonnegative)
  *   iln6(n) = (lnS·10^6 + S/2) div S
  * Error vs true 1e6·ln(n) is < 1 micro-unit (series cutoff <0.1µ,
  * each of ~6 floor divisions ≤ S⁻¹·1e6 ≈ 4.7e-4µ, final rounding
  * ≤ 0.5µ), pinned by IntLnSpec over exhaustive small and random
  * large arguments.
  *
  * Domain: 1 ≤ n; the (n − p)·S numerator is the only quantity that
  * can exceed int64 (n > ~4.3e9), so it runs in 128-bit (BigInt here,
  * decimal(38,0) in Spark, HUGEINT in DuckDB) — counts up to 2^63
  * stay exact.
  */
object IntLn {
  /** 2^31: the fixed-point scale. */
  val S = 2147483648L

  /** round(2^31 · ln 2). */
  val Ln2S = 1488522236L

  def iln6(n: Long): Long = {
    require(n >= 1, s"iln6: domain is n >= 1, got $n")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val p = 1L << b
    val u = ((BigInt(n - p) * S) / (n + p)).toLong
    val u2 = u * u / S
    val u3 = u2 * u / S
    val u5 = u3 * u2 / S
    val u7 = u5 * u2 / S
    val u9 = u7 * u2 / S
    val u11 = u9 * u2 / S
    val lnS = b * Ln2S +
      2L * (u + u3 / 3 + u5 / 5 + u7 / 7 + u9 / 9 + u11 / 11)
    (lnS * 1000000L + S / 2) / S
  }
}
