package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-row kernels over micro-fixed (int64) series windows.
  *
  * These replace interpreted higher-order-function lambdas
  * (`aggregate`/`zip_with`/`filter` chains) in the windowed-statistics
  * hot paths: Catalyst evaluates each lambda application through the
  * interpreter with boxed values and per-element `element_at` calls,
  * which costs ~1 ms/row for an O(w²) kernel at w = 20 — three orders
  * of magnitude over a primitive-array loop doing identical integer
  * arithmetic. At 100 TB (billions of window rows) the lambda form is
  * the job's dominant cost; these expressions keep the SAME exact
  * integer semantics (bit-identical outputs, oracle SQL unchanged)
  * while evaluating as one tight JVM loop per row.
  *
  * Codegen policy (r11): the heavy per-ROW kernels (O(w²) Mann–Kendall
  * / Theil–Sen / KS grid, one call per window row) keep
  * `CodegenFallback` — the kernel is the work, wrapper codegen is
  * noise (same rationale as [[AnomalyExpressionBase]]). The cheap
  * per-CANDIDATE kernels ([[LongArrayBinaryKernel]], [[ScaledL1Dist]],
  * [[Bm25Contrib]] — one call per candidate pair, O(dim) or O(1) each)
  * implement real `doGenCode`: for them the fallback's per-call
  * InternalRow materialization measured ~4× the kernel arithmetic
  * (p06 A/B). KernelCodegenSpec pins codegen == interpreted for every
  * converted kernel.
  */
/** containsNull=false is a hard runtime precondition of every kernel
  * in this file: `ArrayData.toLongArray`/`toDoubleArray` silently read
  * a NULL element as 0, which would corrupt the statistic instead of
  * failing. The FORMAL input type can still carry containsNull=true —
  * e.g. an array built via transform+CASE over a nullable cast —
  * because Catalyst's input-type check ignores nullability and a cast
  * cannot remove it, so the declared `containsNull = false` in
  * `graftInputTypes` is advisory for the binary/double kernels (whose
  * catalog inputs — parquet embedding arrays, nullable-lambda
  * transforms — are formally nullable by construction; the r12 census
  * over all 202 analyzed plans records which). The unary
  * [[LongArrayKernel]] family, whose catalog inputs are all formally
  * non-null, PROMOTES the precondition to an analysis-time check.
  * These converters fail loudly on the first NULL element; the O(n)
  * null scan is noise next to the O(w²)/O(dim) kernels it guards.
  */
private[functions] object KernelInput {
  def longs(raw: Any, who: String): Array[Long] = {
    val a = raw.asInstanceOf[ArrayData]
    assertNoNulls(a, who)
    a.toLongArray()
  }
  def doubles(raw: Any, who: String): Array[Double] = {
    val a = raw.asInstanceOf[ArrayData]
    assertNoNulls(a, who)
    a.toDoubleArray()
  }
  // also called BY GENERATED CODE (the codegen'd kernels' guard) so
  // the scan, the exception, and the message have ONE implementation
  // in both evaluation modes
  private[functions] def assertNoNulls(a: ArrayData, who: String): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$who: NULL array element at position $i — kernel inputs " +
          "must contain no NULL elements (ArrayData.to*Array would " +
          "silently read one as 0)")
      i += 1
    }
  }
}

abstract class LongArrayKernel extends UnaryExpression
    with org.apache.spark.sql.graft.GraftImplicitCastInputs
    with CodegenFallback {
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  protected final def longs(raw: Any): Array[Long] =
    KernelInput.longs(raw, prettyName)
  // containsNull=false is PROMOTED to an analysis-time requirement for
  // this unary family: every catalog input (collect_list windows,
  // gram-hash streams) already carries the non-null formal type, so
  // misuse fails before execution instead of mid-job. The binary /
  // double kernels CANNOT promote — their catalog inputs are parquet
  // embedding arrays and nullable-lambda transforms whose FORMAL type
  // is containsNull=true even though values never are (a cast cannot
  // remove the bit), and ExtensionsSpec pins the SQL-surface contract
  // that clean rows evaluate under a formally-nullable type with only
  // actual NULL elements rejected (by the KernelInput runtime guard,
  // which stays on this family too as defense in depth).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> with non-nullable elements " +
        "(containsNull=false) — a NULL element would silently read as " +
        "0 and corrupt the statistic. Rebuild the array non-null, " +
        "e.g. filter(arr, x -> x IS NOT NULL) or " +
        "transform(arr, x -> coalesce(x, 0L))")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
}

/** Mann–Kendall window statistics in one pass: `s_stat` = Σ_{i<j}
  * sign(x_j − x_i) and `tie_term` = Σ over tied-value groups of
  * t(t−1)(2t+5) — the two integer inputs of the tie-corrected normal
  * approximation (Var·18 = n(n−1)(2n+5) − tie_term). Pure int64
  * arithmetic on the micro-fixed values: exact, engine-independent.
  * O(w²) sign loop + O(w log w) sort for ties on primitive arrays.
  */
case class MannKendallStats(child: Expression) extends LongArrayKernel {
  override def dataType: DataType = StructType(Seq(
    StructField("s_stat", LongType, nullable = false),
    StructField("tie_term", LongType, nullable = false)))
  override def prettyName: String = "mann_kendall_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val a = longs(input)
    val n = a.length
    var s = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (a(j) > a(i)) s += 1L else if (a(j) < a(i)) s -= 1L
        j += 1
      }
      i += 1
    }
    val sorted = a.clone()
    java.util.Arrays.sort(sorted)
    var ties = 0L
    var k = 0
    while (k < n) {
      var m = k + 1
      while (m < n && sorted(m) == sorted(k)) m += 1
      val t = (m - k).toLong
      ties += t * (t - 1L) * (2L * t + 5L)
      k = m
    }
    InternalRow(s, ties)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** w-scaled mean-centered Manhattan distance between two equal-length
  * int64 windows: Σ_i |scale·(a_i − b_i) − diff| where `diff` is the
  * caller's Σa − Σb (so each term is the centered difference cleared
  * of the /w — see the a52/a53 matrix-profile derivation). NULL when
  * lengths differ (malformed window pair). Domain: |scale·Δx − diff| ≤
  * 2·scale·1e15 under the events micro contract — no overflow.
  */
case class ScaledL1Dist(left: Expression, right: Expression,
    diff: Expression, scale: Int) extends TernaryExpression
    with org.apache.spark.sql.graft.GraftImplicitCastInputs {
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = diff
  override def graftInputTypes: Seq[DataType] = Seq(
    ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "scaled_l1_dist"
  // returns NULL on a length mismatch even when every input is
  // non-null — without this the planner drops the null bit and a
  // mismatch surfaces as 0 instead of NULL
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any, d: Any): Any = {
    val a = KernelInput.longs(l, prettyName)
    val b = KernelInput.longs(r, prettyName)
    if (a.length != b.length) null
    else {
      val c = d.asInstanceOf[Long]
      val w = scale.toLong
      var acc = 0L
      var i = 0
      while (i < a.length) {
        acc += Math.abs(w * (a(i) - b(i)) - c)
        i += 1
      }
      acc
    }
  }

  // per-PAIR kernel in the a52/a53 matrix-profile joins — real codegen
  // for the same reason as [[LongArrayBinaryKernel]] (KernelCodegenSpec
  // pins codegen == interpreted)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // the SAME guard implementation interpreted eval uses
      val guard = (arr: String) =>
        s"""graft.functions.KernelInput$$.MODULE$$.assertNoNulls(
              $arr, "$prettyName");"""
      s"""
        final int $na = $a.numElements();
        final int $nb = $b.numElements();
        ${guard(a)}
        ${guard(b)}
        if ($na != $nb) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          for (int $i = 0; $i < $na; $i++) {
            $acc += java.lang.Math.abs(
              ${scale}L * ($a.getLong($i) - $b.getLong($i)) - $c);
          }
          ${ev.value} = $acc;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, diff = newThird)
}

/** Theil–Sen median slope of a micro-fixed window: the median of all
  * n(n−1)/2 pairwise slopes (x_j − x_i)/(j − i), each ONE correctly-
  * rounded IEEE double division of an exact int64 numerator by a small
  * positive int — bit-identical to the `flatten(transform(...))` +
  * `array_sort` + `element_at(…, (nPairs+1)/2)` lambda pipeline it
  * replaces (same multiset of doubles, same ascending sort, same
  * 1-based median pick; −0.0/NaN can't arise: denominators are
  * positive, numerators integers). NULL for windows of fewer than two
  * points. O(w²) divisions + one primitive sort per row instead of
  * materializing and garbage-collecting a per-row slope ARRAY through
  * three interpreted expression nodes.
  */
case class TheilSenMedianSlope(child: Expression) extends LongArrayKernel {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "theil_sen_median_slope"

  override protected def nullSafeEval(input: Any): Any = {
    val a = longs(input)
    val n = a.length
    if (n < 2) return null
    val slopes = new Array[Double](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        slopes(k) = (a(j) - a(i)).toDouble / (j - i).toDouble
        k += 1; j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(slopes)
    slopes((slopes.length + 1) / 2 - 1)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Shared base for the int64 vector kernels: two ARRAY<BIGINT>
  * children, BIGINT out, NULL on a length mismatch (and therefore
  * `nullable = true` — the planner drops the null bit of a
  * non-nullable expression and a mismatch would read as 0).
  *
  * These are PER-CANDIDATE kernels (one call per (vector, centroid) /
  * (query, neighbor) pair, not one per row), so unlike the O(w²)
  * per-row kernels above they implement real `doGenCode`: a
  * CodegenFallback in a pair-scoring projection forces the codegen'd
  * operator to materialize an InternalRow per call just to feed
  * interpreted eval — measured at ~4× the kernel's own arithmetic on
  * the p06 all-pairs A/B. The generated loop does the identical
  * integer arithmetic (and throws the same first-NULL-element error);
  * KernelCodegenSpec pins codegen == interpreted.
  */
abstract class LongArrayBinaryKernel extends Expression
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
    with org.apache.spark.sql.graft.GraftImplicitCastInputs {
  override def graftInputTypes: Seq[DataType] = Seq(
    ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected def kernel(a: Array[Long], b: Array[Long]): Long

  /** Java loop body accumulating into `acc` (a `long`) at index `i`
    * over ArrayData vars `a` and `b` — must compute exactly what
    * [[kernel]] computes at that index.
    */
  protected def genLoopBody(ctx: CodegenContext, a: String,
      b: String, i: String, acc: String): String

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = KernelInput.longs(l, prettyName)
    val b = KernelInput.longs(r, prettyName)
    if (a.length != b.length) null else kernel(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = leftGen.value.toString
    val b = rightGen.value.toString
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val body = genLoopBody(ctx, a, b, i, acc)
    // same observable order as eval — first-NULL-element error in a,
    // then in b, THEN the length-mismatch -> NULL rule — via the SAME
    // guard implementation interpreted eval uses
    val guard = (arr: String) =>
      s"""graft.functions.KernelInput$$.MODULE$$.assertNoNulls(
            $arr, "$prettyName");"""
    ev.copy(code = code"""
      ${leftGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${leftGen.isNull}) {
        ${rightGen.code}
        if (!${rightGen.isNull}) {
          final int $na = $a.numElements();
          final int $nb = $b.numElements();
          ${guard(a)}
          ${guard(b)}
          if ($na == $nb) {
            long $acc = 0L;
            for (int $i = 0; $i < $na; $i++) {
              $body
            }
            ${ev.isNull} = false;
            ${ev.value} = $acc;
          }
        }
      }
    """)
  }
}

/** Σ (a_i − b_i)² — the exact integer squared-L2 distance every
  * IVF/k-means/PQ assignment in the ANN family computes per
  * (vector, centroid) pair. Domain: micro-fixed embedding components
  * (|x| ≤ 1e8) at 64 dims keep the sum < 2^63 with headroom.
  */
case class IntSqL2(left: Expression, right: Expression)
    extends LongArrayBinaryKernel {
  override def prettyName: String = "int_sq_l2"
  override protected def kernel(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
  override protected def genLoopBody(ctx: CodegenContext, a: String,
      b: String, i: String, acc: String): String = {
    val d = ctx.freshName("d")
    s"final long $d = $a.getLong($i) - $b.getLong($i); $acc += $d * $d;"
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Σ a_i·b_i — exact integer dot product (pass the same column twice
  * for a squared norm). Same micro-fixed domain bound as [[IntSqL2]].
  */
case class IntDot(left: Expression, right: Expression)
    extends LongArrayBinaryKernel {
  override def prettyName: String = "int_dot"
  override protected def kernel(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  override protected def genLoopBody(ctx: CodegenContext, a: String,
      b: String, i: String, acc: String): String =
    s"$acc += $a.getLong($i) * $b.getLong($i);"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Σ [a_i = b_i] — positionwise agreement count (MinHash signature
  * agreement → estimated Jaccard).
  */
case class IntEqCount(left: Expression, right: Expression)
    extends LongArrayBinaryKernel {
  override def prettyName: String = "int_eq_count"
  override protected def kernel(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { if (a(i) == b(i)) acc += 1L; i += 1 }
    acc
  }
  override protected def genLoopBody(ctx: CodegenContext, a: String,
      b: String, i: String, acc: String): String =
    s"if ($a.getLong($i) == $b.getLong($i)) $acc += 1L;"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** The a10 deterministic KS grid statistic numerator: over a w-point
  * grid built by CUMULATIVE step addition (g₀ = min(arr), gᵢ = gᵢ₋₁ +
  * (max−min)/(w−1) — the reference kernel's exact left-fold, NOT
  * lo + i·step which differs in ulps), the max over grid points of
  * |mAct·#{active ≤ g} − mRef·#{ref ≤ g}| where ref = arr[0..n1),
  * active = arr[n1..n1+n2), mAct = lcm/n2, mRef = lcm/n1. Exact
  * integer output; the doubles go through the identical IEEE op
  * sequence as the SQL lambda pipeline (and DuckDB oracle) this
  * replaces, which cost O(w²) interpreted filter scans per row.
  * NULL unless the window holds exactly n1+n2 points.
  */
case class KsGridStatNum(child: Expression, n1: Int, n2: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graft.GraftImplicitCastInputs
    with CodegenFallback {
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ks_grid_stat_num"

  private val l = {
    @scala.annotation.tailrec
    def gcd(x: Int, y: Int): Int = if (y == 0) x else gcd(y, x % y)
    n1 / gcd(n1, n2) * n2
  }
  private val mAct = l / n2
  private val mRef = l / n1

  override protected def nullSafeEval(input: Any): Any = {
    val arr = KernelInput.doubles(input, prettyName)
    val w = n1 + n2
    if (arr.length != w) return null
    var lo = arr(0); var hi = arr(0)
    var i = 1
    while (i < arr.length) {
      if (arr(i) < lo) lo = arr(i)
      if (arr(i) > hi) hi = arr(i)
      i += 1
    }
    val step = (hi - lo) / (w - 1).toDouble
    var g = lo
    var best = 0L
    var p = 0
    while (p < w) {
      var nAct = 0; var nRef = 0
      var j = 0
      while (j < n1) { if (arr(j) <= g) nRef += 1; j += 1 }
      while (j < w) { if (arr(j) <= g) nAct += 1; j += 1 }
      val d = Math.abs(mAct.toLong * nAct - mRef.toLong * nRef)
      if (d > best) best = d
      p += 1
      g += step
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Strict-less rank sum Σ_{x ∈ sub} #{y ∈ full : y < x} over two
  * double arrays — the min-tie rank-sum statistic the rank/diff tests
  * permute (reference algorithms.go:170-205), previously three O(w²)
  * interpreted aggregate/filter folds per row in a09. IEEE `<` on
  * doubles (±Infinity from the reldiff guard compares identically);
  * inputs need not be equal length (sub is a window slice of full).
  */
case class DoubleRankSum(left: Expression, right: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
    with org.apache.spark.sql.graft.GraftImplicitCastInputs
    with CodegenFallback {
  override def graftInputTypes: Seq[DataType] = Seq(
    ArrayType(DoubleType, containsNull = false),
    ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    left.nullable || right.nullable
  override def prettyName: String = "double_rank_sum"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val sub = KernelInput.doubles(l, prettyName)
    val full = KernelInput.doubles(r, prettyName)
    var acc = 0L
    var i = 0
    while (i < sub.length) {
      var j = 0
      while (j < full.length) {
        if (full(j) < sub(i)) acc += 1L
        j += 1
      }
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Robust per-window location/scale statistics in ONE pass over the
  * collect_list window array: struct(med, mad, q1, q3) where
  * med = sorted(arr)[mid−1], mad = sorted(|xᵢ − med|)[mid−1] (deviations
  * taken over the UNSORTED array — same multiset), q1/q3 =
  * sorted(arr)[q1i−1]/[q3i−1] (all 1-based like element_at). Replaces
  * the interpreted chain `array_sort` + `transform(x -> abs(x − med))`
  * + `array_sort` that every detector-scorecard row (a54/a55/a56/a57/
  * a58's shared flags frame) evaluated per row. Bit-identical — which
  * requires replicating array_sort's EXACT ordering: its lambda
  * compares with primitive `<`/`>` under a STABLE sort, so −0.0 and
  * 0.0 are EQUAL and keep input order (`Arrays.sort(double[])` would
  * order −0.0 < 0.0 and can pick the other zero's bit pattern — caught
  * by the ±0.0 case in the parity spec). |x − med| is the identical
  * IEEE op. NULL for windows shorter than the requested indices.
  * O(w log w) per row — heavy per-ROW kernel, so CodegenFallback per
  * the policy split above. NaN follows Spark SQL's documented
  * comparison semantics exactly (NaN is GREATER than every other
  * value and equal to itself — array_sort's lambda is built from
  * Catalyst LessThan/GreaterThan, which are NaN-aware), so the pick is
  * identical even though the events ingestion contract already
  * excludes NaN.
  */
case class RobustWindowStats(child: Expression, mid: Int, q1i: Int,
    q3i: Int, needMad: Boolean = true) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftImplicitCastInputs
    with CodegenFallback {
  require(mid > 0 && q1i > 0 && q3i > 0, "indices are 1-based")
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType, containsNull = false))
  // a needMad=false instance never computes the slot: declare it
  // nullable and emit NULL so a call site that reads it anyway gets a
  // visible null (propagates / fails fast downstream), not a silent NaN
  override def dataType: DataType = StructType(Seq(
    StructField("med", DoubleType, nullable = false),
    StructField("mad", DoubleType, nullable = !needMad),
    StructField("q1", DoubleType, nullable = false),
    StructField("q3", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "robust_window_stats"

  private def sortedLikeArraySort(arr: Array[Double]): Array[java.lang.Double] = {
    val boxed = new Array[java.lang.Double](arr.length)
    var i = 0
    while (i < arr.length) { boxed(i) = arr(i); i += 1 }
    java.util.Arrays.sort(boxed, RobustWindowStats.SparkOrder) // stable
    boxed
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = KernelInput.doubles(input, prettyName)
    val n = arr.length
    if (n < mid || n < q1i || n < q3i) return null
    val sorted = sortedLikeArraySort(arr)
    val med = sorted(mid - 1).doubleValue()
    // the deviation pass + second sort is half the kernel's work —
    // callers that never read mad (a19's median, a21's quartiles)
    // construct with needMad = false and get a NULL slot
    val mad: Any = if (!needMad) null else {
      val dev = new Array[Double](n)
      var i = 0
      while (i < n) { dev(i) = Math.abs(arr(i) - med); i += 1 }
      sortedLikeArraySort(dev)(mid - 1).doubleValue()
    }
    InternalRow(med, mad,
      sorted(q1i - 1).doubleValue(), sorted(q3i - 1).doubleValue())
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Winnowing fingerprint selection (Schleimer et al., public) over a
  * nonnegative int64 gram-hash stream in one pass: for every length-w
  * window starting at 1-based position i, select the minimum of
  * gs(i−1+o)·w + (w−1−o) over offsets o (the rightmost-minimal-gram
  * tie-break encoded in the low bits), emit (pos = i+o, fp = gram),
  * and keep the DISTINCT records in first-occurrence order — exactly
  * the nested transform/slice/array_min/array_distinct expression
  * chain p36 evaluated interpreted (O(n·w) lambda applications and a
  * fresh slice array per window per row). Domain: grams are 60-bit
  * md5-derived hashes, so gram·w + (w−1) fits int64 with headroom at
  * the enforced w ≤ 8 (2^60·8 + 7 < 2^63); the kernel is on the public
  * SQL surface, so the bound and the nonnegativity of every gram are
  * require()d rather than assumed — a silent overflow or a negative
  * gram would corrupt the k%w position decode. Streams shorter than w
  * yield an empty selection.
  */
case class WinnowFingerprints(child: Expression, w: Int)
    extends LongArrayKernel {
  require(w > 1, "window must have at least 2 grams")
  require(w <= 8,
    "window above 8 grams overflows the 60-bit-hash tie-break encoding")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any = {
    val gs = longs(input)
    val m = gs.length
    // gram*w + (w-1) must stay inside int64: reject out-of-domain
    // grams loudly instead of wrapping to a corrupt (pos, fp) decode
    val maxGram = (Long.MaxValue - (w - 1)) / w
    var g = 0
    while (g < m) {
      if (gs(g) < 0L || gs(g) > maxGram) throw new IllegalArgumentException(
        s"$prettyName: gram hash out of domain at position $g " +
          s"(${gs(g)}) — grams must be nonnegative and at most " +
          s"$maxGram at w=$w (the tie-break encoding gram*w + offset " +
          "must not overflow int64)")
      g += 1
    }
    // primitive first-occurrence dedup: each window emits one (pos, fp)
    // record; a repeat of an already-emitted record can only come from
    // a window at most w−1 starts later (the emitted pos is always
    // ≥ the window start, so older records are unreachable), hence
    // scanning the last w APPENDED records is exactly LinkedHashSet
    // membership — no boxed tuples, no hash set, O(w) per window on
    // two primitive arrays
    val cap = Math.max(m - w + 1, 0)
    val posOut = new Array[Long](cap)
    val fpOut = new Array[Long](cap)
    var len = 0
    var i = 1
    while (i <= m - w + 1) {
      var k = Long.MaxValue
      var o = 0
      while (o < w) {
        val cand = gs(i - 1 + o) * w + (w - 1 - o)
        if (cand < k) k = cand
        o += 1
      }
      val pos = i + (w - 1) - (k % w)
      val fp = k / w
      var seen = false
      var s = Math.max(len - w, 0)
      while (s < len && !seen) {
        if (posOut(s) == pos && fpOut(s) == fp) seen = true
        s += 1
      }
      if (!seen) { posOut(len) = pos; fpOut(len) = fp; len += 1 }
      i += 1
    }
    val rows = new Array[Any](len)
    var r = 0
    while (r < len) { rows(r) = InternalRow(posOut(r), fpOut(r)); r += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** CUSUM range numerator over an int64 window in one pass:
  * max_{j=1..n−1} |n·S_j − j·S_n| with S_j the prefix sum of the first
  * j elements — the a17 shift statistic. Replaces the interpreted
  * `aggregate(slice(arr,…), array(0L), (acc,x) -> array_append(…))` +
  * `array_max(transform(…))` pipeline, which allocated a fresh boxed
  * array per fold step (O(w²) copies per row). Exact int64: domain
  * |v6| ≤ 1e15 micro at w ≤ 20 keeps n·S_j well inside 2^63. NULL for
  * windows of fewer than two points.
  */
case class CusumMaxAbs(child: Expression) extends LongArrayKernel {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cusum_max_abs"

  override protected def nullSafeEval(input: Any): Any = {
    val a = longs(input)
    val n = a.length
    if (n < 2) return null
    var sn = 0L
    var i = 0
    while (i < n) { sn += a(i); i += 1 }
    var best = 0L
    var s = 0L
    var j = 1
    while (j < n) {
      s += a(j - 1)
      val d = Math.abs(n.toLong * s - j.toLong * sn)
      if (d > best) best = d
      j += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RobustWindowStats {
  /** array_sort's comparator under Spark SQL double semantics: −0.0
    * and 0.0 are EQUAL (stable sort keeps input order), NaN is
    * GREATER than every other value and equal to itself (Catalyst
    * LessThan/GreaterThan are NaN-aware — plain Java `<`/`>` would
    * leave a NaN at its input position instead of sorting it last).
    * Serializable: the expression ships to executors with the task.
    */
  private object SparkOrder extends java.util.Comparator[java.lang.Double]
      with Serializable {
    override def compare(x: java.lang.Double, y: java.lang.Double): Int = {
      val a = x.doubleValue(); val b = y.doubleValue()
      if (a < b) -1
      else if (a > b) 1
      else {
        val na = java.lang.Double.isNaN(a)
        val nb = java.lang.Double.isNaN(b)
        if (na == nb) 0 else if (na) 1 else -1
      }
    }
  }
}

/** Hyperplane-LSH bucket id from ±1 Rademacher components derived by
  * the p08 integer hash — sign_d(t, b) = +1 iff
  * (((t·1000003 + b·8191 + d) · 2654435761) mod 2147483647) mod 2 = 1
  * — over a micro-fixed embedding: bit b of the bucket is set iff
  * Σ_d ei_d · sign_d > 0. Pure positive-operand int64 arithmetic,
  * bit-identical to both the SQL lambda fold it replaces and the
  * DuckDB oracle replaying the same formula. The lambda form costs
  * tables × bits × dim interpreted applications per vector (~3 000 at
  * 8×6×64) — this is one flat loop.
  */
case class RademacherLshBucket(child: Expression, table: Int, bits: Int)
    extends LongArrayKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "rademacher_lsh_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val a = longs(input)
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var dot = 0L
      var d = 0
      while (d < a.length) {
        val h = (((table.toLong * 1000003L + b.toLong * 8191L + d) *
          2654435761L) % 2147483647L) % 2L
        dot += (if (h == 1L) a(d) else -a(d))
        d += 1
      }
      if (dot > 0L) bucket |= 1L << b
      b += 1
    }
    bucket
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BM25 per-(posting, query-term) contribution in EXACT 128-bit
  * integer arithmetic:
  *
  *   c6 = (num + den div 2) div den,   num = idf6 · 22 · tf · A,
  *   den = 10·tf·A + 3·A + 9·dl·N
  *
  * — bit-identical to the DECIMAL(38,0) expression pipeline (and the
  * DuckDB HUGEINT oracle) it replaces in p58/p60's scorer. The r11
  * census measured the decimal form at ~8× the cost of identical
  * int64 math on the 4.5M-row candidate stage (BigDecimal allocation
  * per operation per row); plain int64 overflows once A ≈ corpus
  * token count reaches the 1e13+ of the 100 TB design point, so the
  * kernel does 64×64→128 products, 128-bit sums, and a
  * double-estimated, exactly-corrected 128÷128 division (the quotient
  * is bounded by 2.2·idf6 — always a small long). Domain: all inputs
  * nonnegative (idf6 is strictly positive by the Lucene-idf
  * construction); NULL if any input is NULL.
  */
case class Bm25Contrib(idf6: Expression, tf: Expression, dl: Expression,
    aToks: Expression, nDocs: Expression) extends Expression
    with org.apache.spark.sql.graft.GraftImplicitCastInputs {
  override def children: Seq[Expression] = Seq(idf6, tf, dl, aToks, nDocs)
  override def graftInputTypes: Seq[DataType] =
    Seq(LongType, LongType, LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "bm25_contrib"

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Long](5)
    var i = 0
    while (i < 5) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      if (vs(i) < 0L) throw new IllegalArgumentException(
        s"$prettyName: negative input ${vs(i)} at arg $i — all BM25 " +
          "operands are nonnegative by construction")
      i += 1
    }
    Bm25Contrib.c6(vs(0), vs(1), vs(2), vs(3), vs(4))
  }

  // per-(posting, query-term) kernel on a 4.5M-row candidate stage —
  // real codegen calls the SAME static c6, so the 128-bit arithmetic
  // is one implementation in both modes (KernelCodegenSpec pins
  // parity). Children are evaluated SEQUENTIALLY with the negative
  // check after each, exactly like interpreted eval — a row with a
  // negative at arg i and a NULL at arg j > i must throw, not return
  // NULL (and a NULL at arg i must return NULL without evaluating or
  // checking later args).
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val tmps = gens.indices.map(i => ctx.freshName(s"bm25Arg$i"))
    val decls = tmps.map(t => s"long $t = 0L;").mkString("\n")
    val steps = gens.zip(tmps).zipWithIndex.map { case ((g, t), i) => s"""
      if (!${ev.isNull}) {
        ${g.code}
        if (${g.isNull}) {
          ${ev.isNull} = true;
        } else if (${g.value} < 0L) {
          throw new IllegalArgumentException(
            "$prettyName: negative input " + ${g.value} + " at arg $i" +
            " — all BM25 operands are nonnegative by construction");
        } else {
          $t = ${g.value};
        }
      }"""
    }.mkString("\n")
    ev.copy(code = code"""
      boolean ${ev.isNull} = false;
      long ${ev.value} = -1L;
      $decls
      $steps
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.Bm25Contrib$$.MODULE$$.c6(
          ${tmps.mkString(", ")});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(idf6 = c(0), tf = c(1), dl = c(2), aToks = c(3), nDocs = c(4))
}

object Bm25Contrib {
  // unsigned 128-bit helpers over (hi, lo) pairs; every value in this
  // kernel is nonnegative and < 2^127, so signed hi works with
  // unsigned lo throughout
  @inline private def mulHiU(x: Long, y: Long): Long =
    Math.multiplyHigh(x, y) + ((x >> 63) & y) + ((y >> 63) & x)
  @inline private def uloToDouble(lo: Long): Double =
    (lo >>> 1).toDouble * 2.0 + (lo & 1L)
  @inline private def toDouble(hi: Long, lo: Long): Double =
    hi.toDouble * 1.8446744073709552e19 + uloToDouble(lo)
  @inline private def cmp(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Int = {
    val h = java.lang.Long.compareUnsigned(aHi, bHi)
    if (h != 0) h else java.lang.Long.compareUnsigned(aLo, bLo)
  }

  /** The exact quotient (idf6·22·tf·A + den/2) / den with
    * den = 10·tf·A + 3·A + 9·dl·N, floor semantics on positives —
    * identical to the DECIMAL `(num + den div 2) div den`.
    */
  private[graft] def c6(idf6: Long, tf: Long, dl: Long, a: Long,
      n: Long): Long = {
    // num128 = (idf6 · 22 · tf) × A — the first factor is ≤ ~8e14 for
    // any real corpus (idf6 ≤ ln(2·docs)·1e6, tf ≤ doc length), far
    // inside int64; out-of-domain inputs must fail, not silently wrap
    val t22 = Math.multiplyExact(idf6, 22L)
    val t = Math.multiplyExact(t22, tf)
    var numHi = mulHiU(t, a); var numLo = t * a
    // den128 = (10·tf)×A + 3×A + (9·dl)×N, accumulated in 128 bits;
    // the small-constant products must not wrap in their 64-bit limb
    val tf10 = Math.multiplyExact(tf, 10L)
    val a3 = Math.multiplyExact(a, 3L)
    var denHi = mulHiU(tf10, a); var denLo = tf10 * a
    var lo = denLo + a3
    denHi += (if (java.lang.Long.compareUnsigned(lo, denLo) < 0) 1L else 0L)
    denLo = lo
    val d3 = Math.multiplyExact(dl, 9L)
    lo = denLo + d3 * n
    denHi += mulHiU(d3, n) +
      (if (java.lang.Long.compareUnsigned(lo, denLo) < 0) 1L else 0L)
    denLo = lo
    if (denHi == 0L && denLo == 0L) throw new ArithmeticException(
      "bm25_contrib: zero denominator (empty corpus)")
    // rounding shift: num += den >>> 1
    val hHi = denHi >>> 1; val hLo = (denLo >>> 1) | (denHi << 63)
    lo = numLo + hLo
    numHi += hHi +
      (if (java.lang.Long.compareUnsigned(lo, numLo) < 0) 1L else 0L)
    numLo = lo
    // 128÷128: double estimate, then exact ±1-step correction (the
    // estimate's relative error is ~1e-16 against a quotient < 2^40,
    // so the loops run at most once; they are exact regardless)
    var q = (toDouble(numHi, numLo) / toDouble(denHi, denLo)).toLong
    if (q < 0L) q = 0L
    // p = q × den (fits 128: p ≈ num < 2^128 with tiny estimate slack)
    var pHi = mulHiU(q, denLo) + q * denHi; var pLo = q * denLo
    while (cmp(pHi, pLo, numHi, numLo) > 0) {
      q -= 1L
      val nl = pLo - denLo
      pHi -= denHi +
        (if (java.lang.Long.compareUnsigned(pLo, nl) < 0) 1L else 0L)
      pLo = nl
    }
    var rLo = numLo - pLo
    var rHi = numHi - pHi -
      (if (java.lang.Long.compareUnsigned(numLo, rLo) < 0) 1L else 0L)
    while (cmp(rHi, rLo, denHi, denLo) >= 0) {
      q += 1L
      val nl = rLo - denLo
      rHi -= denHi +
        (if (java.lang.Long.compareUnsigned(rLo, nl) < 0) 1L else 0L)
      rLo = nl
    }
    q
  }
}

object SeriesKernelFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  /** Column API: STRUCT(s_stat, tie_term) of a micro-fixed window. */
  def mann_kendall_stats(arr: Column): Column =
    column(MannKendallStats(expression(arr)))

  /** Column API: Σ|scale·(a_i−b_i) − diff| over two int64 windows. */
  def scaled_l1_dist(a: Column, b: Column, diff: Column,
      scale: Int): Column =
    column(ScaledL1Dist(expression(a), expression(b), expression(diff),
      scale))

  /** Column API: exact integer squared-L2 distance Σ(a_i−b_i)². */
  def int_sq_l2(a: Column, b: Column): Column =
    column(IntSqL2(expression(a), expression(b)))

  /** Column API: exact integer dot product Σ a_i·b_i. */
  def int_dot(a: Column, b: Column): Column =
    column(IntDot(expression(a), expression(b)))

  /** Column API: positionwise agreement count Σ[a_i = b_i]. */
  def int_eq_count(a: Column, b: Column): Column =
    column(IntEqCount(expression(a), expression(b)))

  /** Column API: Theil–Sen median pairwise slope of an int64 window. */
  def theil_sen_median_slope(arr: Column): Column =
    column(TheilSenMedianSlope(expression(arr)))

  /** Column API: p08-scheme Rademacher hyperplane LSH bucket id. */
  def rademacher_lsh_bucket(ei: Column, table: Int, bits: Int): Column =
    column(RademacherLshBucket(expression(ei), table, bits))

  /** Column API: winnowing (pos, fp) selection over a gram stream. */
  def winnow_fingerprints(gs: Column, w: Int): Column =
    column(WinnowFingerprints(expression(gs), w))

  /** Column API: max_j |n·S_j − j·S_n| over an int64 window (a17). */
  def cusum_max_abs(arr: Column): Column =
    column(CusumMaxAbs(expression(arr)))

  /** Column API: struct(med, mad, q1, q3) of a double window array;
    * pass `needMad = false` when the mad slot is never read (skips the
    * deviation pass + second sort — half the kernel's work; the slot
    * becomes a nullable NULL so an accidental read is visible, not a
    * silent NaN).
    */
  def robust_window_stats(arr: Column, mid: Int, q1i: Int,
      q3i: Int, needMad: Boolean = true): Column =
    column(RobustWindowStats(expression(arr), mid, q1i, q3i, needMad))

  /** Column API: exact integer KS grid statistic numerator (a10). */
  def ks_grid_stat_num(arr: Column, n1: Int, n2: Int): Column =
    column(KsGridStatNum(expression(arr), n1, n2))

  /** Column API: strict-less rank sum of `sub` against `full`. */
  def double_rank_sum(sub: Column, full: Column): Column =
    column(DoubleRankSum(expression(sub), expression(full)))

  /** Column API: exact 128-bit BM25 term contribution (micro units). */
  def bm25_contrib(idf6: Column, tf: Column, dl: Column, aToks: Column,
      nDocs: Column): Column =
    column(Bm25Contrib(expression(idf6), expression(tf), expression(dl),
      expression(aToks), expression(nDocs)))
}
