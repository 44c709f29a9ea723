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

/** Accent folding — NFC(strip marks(NFD(text))): decompose canonically,
  * drop every combining mark (Mn non-spacing accents/dakuten, Mc spacing
  * matras, Me enclosing — utf8proc's STRIPMARK removes all three classes),
  * recompose. The search/index normalization step ("café" matches "cafe");
  * the trailing NFC pass matters for scripts whose NFD form is not
  * combining marks — Hangul decomposes to Jamo and must recompose to
  * syllables.
  *
  * Cross-engine contract: this is exactly DuckDB `strip_accents`
  * (utf8proc STRIPMARK), verified on accent, stroke-letter (ł kept),
  * ligature (œ/Æ/ß kept), kana-dakuten, Devanagari/Tamil matra (Mc),
  * enclosing-circle (Me), and Hangul cases — which makes the t17 oracle
  * byte-exact. (Round 9 dropped only Mn; DuckDB folds 'कि'→'क' while Mn-only
  * kept the matra — a latent divergence on Indic scripts, now closed.)
  * Same custom-Expression rationale as [[NfcNormalize]]:
  * no Spark builtin, UDFs break codegen.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents expects a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {
  /** Static codegen target. Fast path: a pure-ASCII byte scan (the common
    * row) returns the input instance without decoding or allocating. */
  def strip(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      // utf8proc STRIPMARK (DuckDB strip_accents) removes ALL combining
      // marks — Mn (accents, dakuten), Mc (Devanagari/Tamil matras), and
      // Me (enclosing) — not just the non-spacing class
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Column-level façade. */
  def fold(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
    import org.apache.spark.sql.classic.ExpressionColumnHelper.expr
    toCol(StripAccents(expr(c.cast("string"))))
  }
}
