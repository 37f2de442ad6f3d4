package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** thefuzz-compatible WRatio as a native Catalyst expression
  * (`movielens.py:118-131`'s disambiguation scorer, J7).
  *
  * The heavy lifting lives in [[graft.text.FuzzyMatch.wratio]] (a pure
  * static function); here we only bind it into codegen so the
  * disambiguation projection stays inside whole-stage codegen — no UDF
  * wrapping, no Row encoding, nulls short-circuited by
  * `nullSafeCodeGen`.
  */
case class WRatioScore(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"wratio needs two string inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.text.FuzzyMatch.wratio(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.text.FuzzyMatch.wratio($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WRatioScore {
  /** Column-level entry point: `wratio(expected, candidate)` ∈ 0..100. */
  def apply(a: Column, b: Column): Column =
    Shim.column(WRatioScore(Shim.expression(a), Shim.expression(b)))
}
