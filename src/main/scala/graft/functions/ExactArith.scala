package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact `floor(a·b / c)` over non-negative longs via big-integer
  * intermediates — the overflow-safe kernel for fixed-point × rational
  * products (BM25 contributions: idf_fp · num can exceed 2^63 long
  * before the divide brings it back under). Codegen'd; null-strict.
  */
case class MulDivFloor(first: Expression, second: Expression,
                       third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT, BIGINT)")
  override def dataType: DataType = LongType
  override def prettyName: String = "mul_div_floor"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    MulDivFloor.evalExact(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.MulDivFloor.evalExact($a, $b, $c);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

object MulDivFloor {
  /** Math.multiplyHigh fast path when the product fits a long; BigInt
    * otherwise. Requires a,b ≥ 0 and c > 0 (floor = truncation).
    */
  def evalExact(a: Long, b: Long, c: Long): Long = {
    require(a >= 0 && b >= 0 && c > 0,
      s"mul_div_floor expects a,b >= 0 and c > 0, got ($a, $b, $c)")
    val hi = Math.multiplyHigh(a, b)
    if (hi == 0L && a * b >= 0L) (a * b) / c
    else (BigInt(a) * BigInt(b) / BigInt(c)).toLong
  }

  def column(a: Column, b: Column, c: Column): Column =
    ColumnBridge.column(MulDivFloor(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(c)))
}
