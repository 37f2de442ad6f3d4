package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering this engine's native
  * expressions as SQL functions, so pure-SQL callers (spark.sql, JDBC,
  * SQL files) reach the same codegen'd kernels the DataFrame API uses:
  *
  *   SELECT array_dot(a.vec, b.vec), hamming_dist(a.sig, b.sig) ...
  *
  * Activate with `.withExtensions(new GraftExtensions)` on the builder,
  * or cluster-wide via `spark.sql.extensions=graft.functions.GraftExtensions`
  * — the standard injection point, no fork of the session needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String, usage: String, make: (Expression, Expression) => Expression)
  : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { exprs: Seq[Expression] =>
      require(exprs.length == 2, s"$name expects exactly 2 arguments, got ${exprs.length}")
      make(exprs(0), exprs(1))
    })

  private def unary(name: String, usage: String, make: Expression => Expression)
  : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { exprs: Seq[Expression] =>
      require(exprs.length == 1, s"$name expects exactly 1 argument, got ${exprs.length}")
      make(exprs(0))
    })

  /** The single source of truth both injection paths share. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    binary("array_dot",
      "array_dot(a, b) - dot product of two array<double> (codegen'd, no intermediate array)",
      ArrayDot(_, _)),
    binary("hamming_dist",
      "hamming_dist(a, b) - Hamming distance between two fingerprint strings (codegen'd byte loop)",
      HammingDist(_, _)),
    binary("char_interleave",
      "char_interleave(s, sep) - sep between every pair of adjacent chars (codegen'd, UTF-8-aware; BPE initial tokenization)",
      CharInterleave(_, _)),
    unary("nfc_normalize",
      "nfc_normalize(s) - Unicode NFC normalization (java.text.Normalizer; ASCII fast path, stays in codegen)",
      NfcNormalize(_)))

  /** Runtime registration for a session built without the extension
    * (notebooks, shells, tests): same triples, same kernels. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
