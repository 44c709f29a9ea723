package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary detector — the rsync/LBFS/FastCDC
  * rolling-hash scan as ONE O(len) pass: emits every 1-based character
  * position `p` in `[window, len]` where the polynomial hash of the
  * trailing `window` code points is ≡ 0 (mod `divisor`).
  *
  * Hash: Rabin–Karp rolling polynomial, base 31 mod 2³¹−1 —
  * `H(p) = Σ cp[p−w+1+j] · 31^(w−1−j) mod (2³¹−1)`. The rolling update
  * (drop the leading term, multiply by the base, add the new code point)
  * makes the whole scan O(len); the previous formulation md5-hashed each
  * trailing window (O(len·window) digest work — round-11 bench: the most
  * expensive query on the board at sf1.0, 13.6 s). The polynomial is
  * exactly replayable in SQL: the DuckDB d13 twin recomputes each window
  * as a direct power-weighted sum over the same code points with the
  * per-power mod-staging (every term reduced mod M before the sum), which
  * equals the rolling value because both normalize into [0, M).
  *
  * Why a custom Expression (SURVEY §4.3 preference order): the rolling
  * recurrence carries state ACROSS positions, which no composition of
  * Spark HOFs can express without re-reading the window per position
  * (transform+slice is exactly the O(len·window) plan this replaces); a
  * Scala UDF would pay Row serialization and break whole-stage codegen.
  * `doGenCode` emits one static call, so the enclosing Project stays a
  * single codegen'd stage and the scan parallelizes per-partition with
  * zero shuffle — at 100 TB this is a pure map over the corpus.
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  require(window >= 2 && divisor >= 2, "need window >= 2 and divisor >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_boundaries expects a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.boundaries($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  /** 2³¹−1 — the same Mersenne prime the engine's md5-fold hashes use. */
  val M = 2147483647L
  /** Polynomial base. */
  val B = 31L

  /** `B^e mod M` — the power literals the DuckDB twin stages per window
    * slot (window 8 → powers 7 down to 0). */
  def powMod(e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = r * B % M; i += 1 }
    r
  }

  /** Static codegen target: one pass over the UTF-8 bytes, decoding code
    * points in place (no String materialization), ring buffer of the
    * trailing `window` code points, rolling hash update per position. */
  def boundaries(s: UTF8String, window: Int, divisor: Int): UnsafeArrayData = {
    val nBytes = s.numBytes()
    val bw = powMod(window - 1)
    val ring = new Array[Long](window)
    var out = new Array[Int](8)
    var nOut = 0
    var h = 0L
    var pos = 0 // 1-based count of code points consumed
    var i = 0   // byte offset
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      // inline UTF-8 decode — UTF8String guarantees well-formed sequences
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) {
        cp = ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f); i += 2
      } else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f); i += 4
      }
      pos += 1
      val slot = pos % window
      if (pos <= window) h = (h * B + cp) % M
      else {
        // drop the code point leaving the window (stored `window` positions
        // ago — same ring slot), shift, add the entrant
        h = ((h - ring(slot) * bw % M + M) % M * B + cp) % M
      }
      ring(slot) = cp
      if (pos >= window && h % divisor == 0) {
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(nOut) = pos; nOut += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }

  /** Column-level façade. */
  def cdcBoundaries(c: Column, window: Int, divisor: Int): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
    import org.apache.spark.sql.classic.ExpressionColumnHelper.expr
    toCol(CdcBoundaries(expr(c.cast("string")), window, divisor))
  }
}

/** [[CdcBoundaries]] over RAW BYTES — the multimodal-payload variant: the
  * same rolling polynomial, but each position is one byte (0–255) of a
  * `binary` cell instead of one code point, so boundary positions index
  * directly into byte-based `substring` slices (the [[graft.ext.Multimodal]]
  * chunk unit). The DuckDB twin recomputes each window over `hex(payload)`
  * two-hex-digit slices — byte values are exact small integers in both
  * engines. */
case class CdcBoundariesBytes(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  require(window >= 2 && divisor >= 2, "need window >= 2 and divisor >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_boundaries_bytes expects a binary input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundariesBytes.boundaries(input.asInstanceOf[Array[Byte]], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundariesBytes.boundaries($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundariesBytes {
  import CdcBoundaries.{B, M, powMod}

  /** Static codegen target: the [[CdcBoundaries.boundaries]] ring scan with
    * the byte value (0–255) as the polynomial term. */
  def boundaries(bytes: Array[Byte], window: Int, divisor: Int): UnsafeArrayData = {
    val bw = powMod(window - 1)
    val ring = new Array[Long](window)
    var out = new Array[Int](8)
    var nOut = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val cp = bytes(i) & 0xff
      val pos = i + 1
      val slot = pos % window
      if (pos <= window) h = (h * B + cp) % M
      else h = ((h - ring(slot) * bw % M + M) % M * B + cp) % M
      ring(slot) = cp
      if (pos >= window && h % divisor == 0) {
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(nOut) = pos; nOut += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }

  /** Column-level façade. */
  def cdcBoundariesBytes(c: Column, window: Int, divisor: Int): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
    import org.apache.spark.sql.classic.ExpressionColumnHelper.expr
    toCol(CdcBoundariesBytes(expr(c), window, divisor))
  }
}
