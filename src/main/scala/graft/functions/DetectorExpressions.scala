package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

import graft.operators.Detectors

/** `detector_probs(window)`: magnitude, fence, cdf and their ensemble in
  * ONE pass over the trailing-window array — the fused form of the
  * [[graft.operators.Detectors]] expression pipeline. That pipeline
  * stacks several WindowExec passes (row_number, two trailing means,
  * lag-diff, two diff means, a collected diff array); this expression
  * needs just one collect_list window, and at the measured sf0.1 scale
  * halves the wall-clock of the ensemble query.
  *
  * Bit-parity contract (pinned in DetectorsSpec and by the shared
  * DuckDB oracles): every arithmetic step reproduces the Column
  * pipeline exactly — frame means are fresh left-folds in frame order
  * (Spark's sliding-frame Average recomputes the same way), rounding is
  * BigDecimal HALF_UP like Spark's `round`, the ensemble's weighted
  * mean divides in double like Spark's `/` on longs.
  *
  * Returns NULL for warm-up rows (`rn < windowSize` — callers filter
  * them anyway). A window that is short even though `rn` says it
  * shouldn't be means collect_list dropped NULL observations; that
  * silently diverges from the Column pipeline, so it throws instead
  * (the reference's data model has no NULL observations).
  */
case class DetectorEval(window: Expression, rn: Expression,
    spec: Detectors.Spec) extends BinaryExpression with CodegenFallback {

  override def left: Expression = window
  override def right: Expression = rn
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("prob_magnitude", DoubleType, nullable = false),
    StructField("prob_fence", DoubleType, nullable = false),
    StructField("prob_cdf", DoubleType, nullable = false),
    StructField("prob_ensemble", DoubleType, nullable = false)))
  override def prettyName: String = "detector_probs"
  override def checkInputDataTypes(): TypeCheckResult =
    (window.dataType, rn.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (w, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<DOUBLE>, INT), got (${w.sql}, ${r.sql})")
    }

  // Spark Round(x, s): BigDecimal.valueOf(x).setScale(s, HALF_UP)
  private def rnd(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else JBigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP)
      .doubleValue()

  private def cap01(x: Double): Double = math.min(math.max(x, 0.0), 1.0)

  private def meanOf(arr: Array[Double], from: Int, until: Int): Double = {
    var s = 0.0
    var i = from
    while (i < until) { s += arr(i); i += 1 }
    s / (until - from)
  }

  private val sensMicro: Long = math.round(spec.sensitivity * 1e6)

  override protected def nullSafeEval(input: Any, rnVal: Any): Any = {
    // guarded conversion: a NULL element would silently read as 0.0
    // (can't arise from collect_list, which drops NULLs — the guard
    // covers direct SQL calls on arbitrary arrays)
    val arr = KernelInput.doubles(input, prettyName)
    val w = spec.windowSize
    val a = spec.activeSize
    if (arr.length < w) {
      if (rnVal.asInstanceOf[Int] >= w) throw new IllegalStateException(
        s"$prettyName: window has ${arr.length} < $w values at row " +
          s"$rnVal — NULL observations in the value column are not " +
          "supported (the plain Detectors pipeline would silently skip " +
          "them); filter or impute them upstream")
      return null
    }

    val actMean = meanOf(arr, w - a, w)
    val refMean = meanOf(arr, 0, w - a)

    val magnitude =
      if (refMean == 0.0) { if (actMean == 0.0) 0.0 else 1.0 }
      else math.abs(actMean - refMean) / refMean
    val pm = rnd(cap01(magnitude), 6)

    val fenceDistance = spec.lowerBound match {
      case None => actMean / spec.upperBound
      case Some(lower) =>
        val bound = (spec.upperBound - lower) / 2
        val mid = lower + bound
        math.abs(actMean - mid) / bound
    }
    val pf = rnd((math.pow(10.0, cap01(fenceDistance)) - 1.0) / 9.0, 6)

    // d(k) = |arr(k) - arr(k-1)|, k in 1..w-1; active = last a diffs,
    // reference = first w-a-1 diffs (same frames as the Column pipeline)
    val d = new Array[Double](w - 1)
    var k = 1
    while (k < w) { d(k - 1) = math.abs(arr(k) - arr(k - 1)); k += 1 }
    val cdfRefLen = w - a - 1
    val actMeanD = meanOf(d, w - 1 - a, w - 1)
    val refMeanD = meanOf(d, 0, cdfRefLen)
    val thresh = rnd(actMeanD - refMeanD, 6)
    var cnt = 0
    var j = 0
    while (j < cdfRefLen) { if (rnd(d(j), 6) <= thresh) cnt += 1; j += 1 }
    val percentile = cnt / cdfRefLen.toDouble
    val pc = rnd(2.0 * math.abs(0.5 - percentile), 6)

    // ensemble in exact integer micro-probability space (see Detectors)
    val pm6 = rnd(pm * 1e6, 0).toLong
    val pf6 = rnd(pf * 1e6, 0).toLong
    val pc6 = rnd(pc * 1e6, 0).toLong
    val wm = if (pm6 > 800000L) 10L else 1L
    val wf = if (pf6 > 800000L) 10L else 1L
    val num = wm * pm6 + wf * pf6 + pc6
    val den = wm + wf + 1L
    val pe =
      if (pm6 < sensMicro) 0.0
      else math.floor((2L * num + den).toDouble / (2L * den).toDouble) / 1e6

    InternalRow(pm, pf, pc, pe)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(window = newLeft, rn = newRight)
}

object DetectorFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  def detector_probs(window: Column, rn: Column,
      spec: Detectors.Spec): Column =
    column(DetectorEval(expression(window), expression(rn), spec))
}
