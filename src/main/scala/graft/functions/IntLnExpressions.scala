package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.kernel.IntLn

/** `graft_iln6(n)`: the deterministic fixed-point natural log
  * ([[graft.kernel.IntLn]]) as a native expression — round-to-micro
  * ln(n) for BIGINT n >= 1, computed in pure integer arithmetic so the
  * result is reproducible across engines, partitionings, and
  * platforms (no libm). Null for null or out-of-domain (< 1) input —
  * the SQL-surface convention (the kernel itself throws, callers in
  * the catalog guarantee the domain).
  *
  * Codegen emits a static kernel call so the surrounding stage stays
  * whole-stage fused (the EsdRounds pattern).
  */
case class Iln6(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_iln6 expects BIGINT, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  // nulls are PRODUCED here (out-of-domain input), not only inherited
  override def nullable: Boolean = true
  override def prettyName: String = "graft_iln6"

  override protected def nullSafeEval(input: Any): Any = {
    val n = input.asInstanceOf[Long]
    if (n < 1L) null else IntLn.iln6(n)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.kernel.IntLn.iln6($c);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IntLnFunctions {
  def iln6(n: Column): Column =
    org.apache.spark.sql.graft.shims.column(Iln6(
      org.apache.spark.sql.graft.shims.expression(n)))
}
