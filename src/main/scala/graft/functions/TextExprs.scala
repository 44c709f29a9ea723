package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonical-composition pass every
  * text-curation pipeline runs before hashing/deduplication (two byte
  * sequences that render identically, e.g. `e` + U+0301 vs precomposed
  * U+00E9, must fingerprint identically or near-dup recall silently drops).
  *
  * Why a custom Expression: Spark has no normalization builtin (collation
  * support in Spark 4 compares normalized but never rewrites the value), and
  * a Scala UDF would pay serialization + break whole-stage codegen. This
  * expression calls `java.text.Normalizer` (JDK, UAX #15 conformant — the
  * same algorithm DuckDB's `nfc_normalize` implements via utf8proc, which is
  * what makes the t16 oracle cross-engine exact) through a static helper
  * with an `isNormalized` fast path, so the common all-ASCII row allocates
  * nothing and the enclosing Project stays in WholeStageCodegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static codegen target. Fast path: `isNormalized` is a scan without
    * allocation (true for pure-ASCII and most already-composed text), so
    * only rows that actually decompose pay the rewrite. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-level façade. */
  def normalize(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
    import org.apache.spark.sql.classic.ExpressionColumnHelper.expr
    toCol(NfcNormalize(expr(c.cast("string"))))
  }
}
