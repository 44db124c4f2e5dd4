package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_esd_rounds(arr, sx, sxx, w, k)`: the k generalized-ESD
  * (Rosner) rounds over one full trailing window as a single native
  * expression — the tight-loop form of the SQL fold in
  * `graft.queries.Anomaly.esdFoldSql` (kept there as the
  * SQL-expressible reference; EsdProps pins the two bit-identical on
  * random windows).
  *
  * Why native: the fold is semantically right but interpretively
  * expensive — nested higher-order functions allocate a struct per
  * inner-fold step, ~95 us/row measured, and the window stage it runs
  * in has only #series-way parallelism, so a 1M-row 5-series corpus
  * spent ~20 s/eval in the fold alone. This expression does the same
  * O(k·w) integer arithmetic in a Scala loop (no per-step allocation)
  * at well under 1 us/row.
  *
  * Semantics (identical to the fold, pinned by EsdSpec/EsdProps and
  * the shared DuckDB oracle): per round over the surviving n values —
  * varnum = n·Σx² − (Σx)² in unbounded integers (the inputs' Σx² is
  * DECIMAL(38,0)); deviation |n·x − Σx| in int64 (in-domain by the
  * events value contract); max deviation with FIRST index on ties;
  * R_r = (maxdev / n) / sqrt(varnum / (n(n−1))) in exactly that double
  * op order, NULL when the round is constant (varnum = 0 — the fold's
  * try_divide); remove the argmax by integer subtraction. `vnz` is the
  * all-rounds-non-constant flag callers filter on. Total on any input
  * (short arrays from predicate-pushdown evaluation yield unspecified
  * values, never errors — such rows cannot pass the caller's rn
  * filter).
  */
case class EsdRounds(arr: Expression, sx: Expression, sxx: Expression,
    w: Int, k: Int) extends TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = sx
  override def third: Expression = sxx
  override def nullable: Boolean = true
  override def prettyName: String = "graft_esd_rounds"

  override def dataType: DataType = StructType(
    (1 to k).map(i => StructField(s"r$i", DoubleType, nullable = true)) :+
      StructField("vnz", BooleanType, nullable = false))

  // sxx must be an INTEGER decimal (scale 0): the kernel consumes it
  // as an exact BigInteger sum of squares — a nonzero scale would be a
  // caller bug this check turns into an analysis error instead of a
  // silently truncated statistic (the eval additionally uses
  // toBigIntegerExact as a runtime backstop).
  override def checkInputDataTypes(): TypeCheckResult =
    (arr.dataType, sx.dataType, sxx.dataType) match {
      case (ArrayType(LongType, _), LongType, d: DecimalType)
          if d.scale == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<BIGINT>, BIGINT, DECIMAL(p, 0)), " +
          s"got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override protected def nullSafeEval(arrVal: Any, sxVal: Any,
      sxxVal: Any): Any =
    EsdRoundsKernel.eval(arrVal.asInstanceOf[ArrayData],
      sxVal.asInstanceOf[Long], sxxVal.asInstanceOf[Decimal], w, k)

  // Codegen emits ONE static kernel call, so the surrounding
  // projection/window stage stays inside whole-stage codegen (the
  // previous CodegenFallback cut the fused span at this node); the
  // O(k·w) loop itself is branchy scalar code the JIT already
  // compiles well in the kernel object.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val kernel = "graft.functions.EsdRoundsKernel"
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = $kernel.eval($a, $b, $c, $w, $k);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(arr = newFirst, sx = newSecond, sxx = newThird)
}

/** The ESD round loop as a static kernel shared by interpreted eval and
  * generated code (top-level object methods get static forwarders, so
  * codegen calls `EsdRoundsKernel.eval(...)` directly).
  */
object EsdRoundsKernel {

  def eval(arrVal: ArrayData, sxVal: Long, sxxVal: Decimal, w: Int,
      k: Int): InternalRow = {
    // guarded conversion: a NULL element would silently read as 0
    val xs = KernelInput.longs(arrVal, "graft_esd_rounds")
    var sxCur = sxVal
    // toBigIntegerExact: a fractional Σx² is out of contract — fail
    // loudly rather than truncate (ArithmeticException surfaces as the
    // query error it is)
    var sxxCur = sxxVal.toJavaBigDecimal.toBigIntegerExact
    // mutable working copy; rounds shrink the logical length
    val work = java.util.Arrays.copyOf(xs, xs.length)
    var len = work.length
    val out = new Array[Any](k + 1)
    var vnz = true
    var r = 1
    while (r <= k) {
      val n = w - (r - 1)
      val varnum = BigInteger.valueOf(n).multiply(sxxCur)
        .subtract(BigInteger.valueOf(sxCur)
          .multiply(BigInteger.valueOf(sxCur)))
      val constant = varnum.signum == 0
      if (constant) vnz = false
      // first-index max of |n·x − sx| (strict > keeps the first)
      var maxdev = -1L
      var idx = 1
      var i = 0
      val scan = math.min(n, len)
      while (i < scan) {
        val d = math.abs(n * work(i) - sxCur)
        if (d > maxdev) { maxdev = d; idx = i + 1 }
        i += 1
      }
      out(r - 1) =
        if (constant) null
        else maxdev.toDouble / n.toDouble /
          math.sqrt(varnum.doubleValue() / (n * (n - 1)).toDouble)
      // remove the argmax (guarded for short-array totality)
      if (idx <= len && len > 0) {
        val rm = work(idx - 1)
        System.arraycopy(work, idx, work, idx - 1, len - idx)
        len -= 1
        sxCur -= rm
        sxxCur = sxxCur.subtract(
          BigInteger.valueOf(rm).multiply(BigInteger.valueOf(rm)))
      }
      r += 1
    }
    out(k) = vnz
    InternalRow(out: _*)
  }
}

object EsdFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  /** Column API: the k ESD rounds over (window array, Σx, Σx²). */
  def esd_rounds(arr: Column, sx: Column, sxx: Column, w: Int,
      k: Int): Column =
    column(EsdRounds(expression(arr), expression(sx), expression(sxx),
      w, k))
}
