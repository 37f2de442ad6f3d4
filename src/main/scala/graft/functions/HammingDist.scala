package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Hamming distance over two equal-length fingerprint
  * strings (SimHash bit-strings in this engine).
  *
  * The composable alternative — `aggregate(sequence(1, 64), 0, (acc, i)
  * -> acc + IF(substring(sa,i,1) = substring(sb,i,1), 0, 1))` —
  * allocates two single-char UTF8Strings per bit per row via the HOF
  * machinery; on the near-dup verification join it dominated q54's CPU
  * (38 process-CPU seconds at sf0.1). This expression is a fused byte
  * loop inside whole-stage codegen: zero allocation, direct byte
  * comparison over the UTF8 buffers (bit-string chars are ASCII, so
  * byte == char).
  *
  * Strings of unequal length compare over the shorter prefix plus the
  * length difference — every surplus position counts as a mismatch —
  * matching the HOF formulation padded with non-matching positions.
  */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hamming_dist needs two string inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length)
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: see ArrayDot — fixed locals break Janino when two of
      // these land in one codegen scope
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = $xb.length < $yb.length ? $xb.length : $yb.length;
         |int $d = java.lang.Math.abs($xb.length - $yb.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xb[$i] != $yb[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  /** Column-level entry point: `hamming_dist(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Shim.column(HammingDist(Shim.expression(a), Shim.expression(b)))
}
