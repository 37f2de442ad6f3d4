package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst char-interleave: insert `sep` between every pair of
  * adjacent characters of `str` ("abc", "|" → "a|b|c") — the initial
  * character tokenization of the BPE encoder ([[graft.text.Bpe]]).
  *
  * The composable alternative — `array_join(transform(sequence(1,
  * length(w)), i -> substr(w, i, 1)), sep)` — runs through the
  * higher-order-function machinery OUTSIDE whole-stage codegen: a
  * boxed sequence array plus one single-char UTF8String allocation per
  * character per row (~200 allocations per 40-word doc). This is a
  * fused byte loop in codegen: one output buffer, UTF-8-aware (a
  * separator lands before every non-continuation byte except the
  * first — code points never split), zero per-char allocation.
  */
case class CharInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"char_interleave needs two string inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].getBytes
    val sep = b.asInstanceOf[UTF8String].getBytes
    if (s.length == 0 || sep.length == 0) return a
    // count the separators that will actually be inserted (i > 0 AND
    // non-continuation) — NOT nc-1: malformed UTF-8 whose first byte is
    // a continuation byte would get a separator before every start byte
    // and overrun an nc-1-sized buffer
    var ins = 0
    var i = 1
    while (i < s.length) { if ((s(i) & 0xC0) != 0x80) ins += 1; i += 1 }
    if (ins == 0) return a
    val out = new Array[Byte](s.length + ins * sep.length)
    var pos = 0
    i = 0
    while (i < s.length) {
      if (i > 0 && (s(i) & 0xC0) != 0x80) {
        System.arraycopy(sep, 0, out, pos, sep.length); pos += sep.length
      }
      out(pos) = s(i); pos += 1; i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sb = ctx.freshName("sb")
      val sepb = ctx.freshName("sepb")
      val ins = ctx.freshName("ins")
      val out = ctx.freshName("out")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      s"""
         |byte[] $sb = $a.getBytes();
         |byte[] $sepb = $b.getBytes();
         |if ($sb.length == 0 || $sepb.length == 0) {
         |  ${ev.value} = $a;
         |} else {
         |  int $ins = 0;
         |  for (int $i = 1; $i < $sb.length; $i++) {
         |    if (($sb[$i] & 0xC0) != 0x80) $ins++;
         |  }
         |  if ($ins == 0) {
         |    ${ev.value} = $a;
         |  } else {
         |    byte[] $out = new byte[$sb.length + $ins * $sepb.length];
         |    int $pos = 0;
         |    for (int $i = 0; $i < $sb.length; $i++) {
         |      if ($i > 0 && (($sb[$i] & 0xC0) != 0x80)) {
         |        System.arraycopy($sepb, 0, $out, $pos, $sepb.length);
         |        $pos += $sepb.length;
         |      }
         |      $out[$pos++] = $sb[$i];
         |    }
         |    ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharInterleave {
  /** Column-level entry point: `char_interleave(str, sep)`. */
  def apply(s: Column, sep: Column): Column =
    Shim.column(CharInterleave(Shim.expression(s), Shim.expression(sep)))
}
