package graft.functions

import java.util.SplittableRandom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.kernel.{AnomalyzerConf, Ensemble}

/** Catalyst expressions exposing the anomaly kernel as native columns.
  *
  * A custom `Expression` (not a Scala UDF) so the operator participates
  * in Catalyst analysis — typed inputs, null propagation, constant
  * folding around it — and avoids UDF serialization overhead per row.
  * The kernel itself is scalar-heavy (permutation loops), so codegen of
  * the wrapper is irrelevant: `CodegenFallback` keeps the surrounding
  * projection inside whole-stage codegen while this node evaluates
  * interpreted.
  *
  * Inputs: `window` ARRAY<DOUBLE> — the (reference+active) tail for one
  * evaluation, oldest first; `seed` BIGINT — deterministic per-row RNG
  * seed (see [[graft.kernel.Ensemble.seedFor]]).
  */
abstract class AnomalyExpressionBase
    extends BinaryExpression with CodegenFallback {
  def window: Expression
  def seed: Expression
  def conf: AnomalyzerConf

  override def left: Expression = window
  override def right: Expression = seed
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (window.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && seed.dataType == LongType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<DOUBLE>, BIGINT), got " +
        s"(${window.dataType.sql}, ${seed.dataType.sql})")
  }

  protected def values(w: Any): Array[Double] =
    w.asInstanceOf[ArrayData].toDoubleArray()
  protected def rng(s: Any): SplittableRandom =
    new SplittableRandom(s.asInstanceOf[Long])
}

/** Final ensemble probability — the reference's `Eval`
  * (/root/reference/anomalyze.go:142-192) over the window column.
  */
case class AnomalyProb(window: Expression, seed: Expression,
    conf: AnomalyzerConf) extends AnomalyExpressionBase {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "anomaly_prob"
  override protected def nullSafeEval(w: Any, s: Any): Any =
    Ensemble.eval(values(w), conf, rng(s))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(window = newLeft, seed = newRight)
}

/** Per-test probabilities — the reference's `EvalByTest` probmap
  * (/root/reference/anomalyze.go:195-221) as MAP<STRING, DOUBLE>.
  */
case class AnomalyProbsByTest(window: Expression, seed: Expression,
    conf: AnomalyzerConf) extends AnomalyExpressionBase {
  override def dataType: DataType =
    MapType(StringType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "anomaly_probs_by_test"
  override protected def nullSafeEval(w: Any, s: Any): Any = {
    val probmap = Ensemble.evalByTest(values(w), conf, rng(s))
    val ks = new Array[Any](probmap.size)
    val vs = new Array[Any](probmap.size)
    var i = 0
    probmap.foreach { case (k, v) =>
      ks(i) = UTF8String.fromString(k); vs(i) = v; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(window = newLeft, seed = newRight)
}

object AnomalyFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  /** Column API: ensemble anomaly probability for a window array. */
  def anomaly_prob(window: Column, seed: Column, conf: AnomalyzerConf): Column =
    column(AnomalyProb(expression(window), expression(seed),
      AnomalyzerConf.validated(conf)))

  /** Column API: per-test probability map for a window array. */
  def anomaly_probs_by_test(window: Column, seed: Column,
      conf: AnomalyzerConf): Column =
    column(AnomalyProbsByTest(expression(window), expression(seed),
      AnomalyzerConf.validated(conf)))
}
