package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the standard
  * first step of corpus text prep (decomposed accents, compatibility
  * variants, and platform-dependent encodings all collapse to one
  * canonical byte sequence; dedup/fingerprint/tokenize operators all
  * assume it has run). Spark has no built-in normalizer; this wraps
  * `java.text.Normalizer` behind an ASCII fast path (one byte scan —
  * the overwhelmingly common case allocates nothing and returns the
  * input buffer). DuckDB's `nfc_normalize` (utf8proc) implements the
  * same Unicode algorithm, which is what lets q103 hash-match.
  *
  * Codegen calls the same static kernel — the expression stays inside
  * whole-stage codegen with no fallback to interpreted projection. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    NfcNormalize.normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        return UTF8String.fromString(
          java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s // pure ASCII: already NFC
  }

  /** Column-level entry point: `nfc_normalize(s)`. */
  def apply(s: Column): Column = Shim.column(NfcNormalize(Shim.expression(s)))
}
