package graft.kernel

import java.util.SplittableRandom

/** Pure-Scala vector kernel: the numeric primitives behind the anomaly
  * tests. Zero Spark dependencies so it can run inside Catalyst
  * expressions, streaming state handlers, and plain unit tests alike.
  *
  * Semantics mirror the reference engine's vector kernel (see
  * /root/reference/algorithms.go and the govector call sites catalogued
  * in SURVEY.md §2D). Where the upstream tie/edge behavior is not
  * observable from the reference alone, the choice made here is
  * documented inline and pinned by unit tests.
  */
object Vec {

  /** Arithmetic mean; empty input yields NaN (matches Go 0/0 behavior). */
  def mean(xs: Array[Double]): Double = {
    if (xs.length == 0) return Double.NaN
    var s = 0.0
    var i = 0
    // sequential fold: fixed accumulation order => machine-stable results
    while (i < xs.length) { s += xs(i); i += 1 }
    s / xs.length
  }

  def sum(xs: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < xs.length) { s += xs(i); i += 1 }
    s
  }

  /** Fractional ranks of each element within the vector.
    *
    * Tie rule: rank(x_i) = index of the first element equal to x_i in the
    * ascending sorted copy (0-based "min" ties). Reference:
    * algorithms.go:107,126,172,189 (govector.Rank). The permutation
    * rank-sum statistic is invariant to an affine change of rank basis,
    * so min-vs-average tie handling only matters on ties; the choice is
    * pinned by RankSpec.
    */
  def rank(xs: Array[Double]): Array[Double] = {
    val sorted = xs.clone()
    java.util.Arrays.sort(sorted)
    val out = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) {
      out(i) = lowerBound(sorted, xs(i)).toDouble
      i += 1
    }
    out
  }

  /** First index at which `x` could be inserted keeping order (count of
    * elements strictly below x).
    */
  private[kernel] def lowerBound(sorted: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Count of elements <= x in the sorted array (upper bound index). */
  private[kernel] def upperBound(sorted: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Empirical CDF of the sample: F(q) = #{x <= q} / n.
    * Reference: algorithms.go:217,268-269 (govector.Ecdf).
    */
  def ecdf(xs: Array[Double]): Double => Double = {
    val sorted = xs.clone()
    java.util.Arrays.sort(sorted)
    val n = sorted.length.toDouble
    (q: Double) => upperBound(sorted, q) / n
  }

  /** Successive differences x(i+1) - x(i); length n-1.
    * Reference: algorithms.go:210 (govector.Diff).
    */
  def diff(xs: Array[Double]): Array[Double] = {
    if (xs.length <= 1) return Array.empty
    val out = new Array[Double](xs.length - 1)
    var i = 0
    while (i < out.length) { out(i) = xs(i + 1) - xs(i); i += 1 }
    out
  }

  /** Successive relative differences (x(i+1) - x(i)) / x(i); length n-1.
    * Division by zero follows IEEE-754 (Inf/NaN), as in the Go original.
    * Reference: algorithms.go:107,126 (govector.RelDiff).
    */
  def relDiff(xs: Array[Double]): Array[Double] = {
    if (xs.length <= 1) return Array.empty
    val out = new Array[Double](xs.length - 1)
    var i = 0
    while (i < out.length) { out(i) = (xs(i + 1) - xs(i)) / xs(i); i += 1 }
    out
  }

  def abs(xs: Array[Double]): Array[Double] = xs.map(math.abs)

  /** Seeded Fisher–Yates permutation — the port of govector.Shuffle
    * (the reference shuffles with Go's unseeded global RNG,
    * algorithms.go:126,189,300). The bootstrap tests themselves now
    * draw permutations from the md5-keyed [[PermDraw]] (replayable by
    * the SQL oracle); this stays as the kernel's general-purpose
    * seeded shuffle.
    */
  def shuffle(xs: Array[Double], rng: SplittableRandom): Array[Double] = {
    val out = xs.clone()
    var i = out.length - 1
    while (i > 0) {
      val j = rng.nextInt(i + 1)
      val t = out(i); out(i) = out(j); out(j) = t
      i -= 1
    }
    out
  }

  /** Linspace with the reference's cumulative-step construction (FP error
    * accumulates left to right, deliberately preserved).
    * Reference: algorithms.go:312-323.
    */
  def interpolate(min: Double, max: Double, npoints: Int): Array[Double] = {
    val out = new Array[Double](npoints)
    if (npoints == 0) return out
    val step = (max - min) / (npoints - 1).toDouble
    out(0) = min
    var i = 1
    while (i < npoints) { out(i) = out(i - 1) + step; i += 1 }
    out
  }

  /** Clamp x into [lo, hi]. Reference: algorithms.go:29-31. */
  def cap(x: Double, lo: Double, hi: Double): Double =
    math.max(math.min(x, hi), lo)

  /** Convex [0,1]->[0,1] rescale: (base^x - 1)/(base - 1).
    * Reference: algorithms.go:96-100.
    */
  def weightExp(x: Double, base: Double): Double =
    (math.pow(base, x) - 1) / (math.pow(base, 1) - 1)

  /** Weighted mean Σwᵢxᵢ/Σwᵢ; empty or zero-weight input yields NaN
    * (callers guard, mirroring anomalyze.go:187-189).
    */
  def weightedMean(xs: Array[Double], ws: Array[Double]): Double = {
    require(xs.length == ws.length, "weightedMean: length mismatch")
    var num = 0.0
    var den = 0.0
    var i = 0
    while (i < xs.length) { num += xs(i) * ws(i); den += ws(i); i += 1 }
    num / den
  }

  /** Split the tail of the vector into (reference, active) windows.
    * Clamps both sizes to what is available (graceful degradation on
    * short series) and returns None when the clamped reference window is
    * below the test's minimum. Reference: algorithms.go:56-69.
    */
  def extractWindows(
      v: Array[Double],
      refSize0: Int,
      activeSize0: Int,
      minRefSize: Int): Option[(Array[Double], Array[Double])] = {
    val n = v.length
    val activeSize = math.min(activeSize0, n)
    val refSize = math.min(refSize0, n - activeSize)
    if (refSize < minRefSize) None
    else Some((
      java.util.Arrays.copyOfRange(v, n - activeSize - refSize, n - activeSize),
      java.util.Arrays.copyOfRange(v, n - activeSize, n)))
  }
}
