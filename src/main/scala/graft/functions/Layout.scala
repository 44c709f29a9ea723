package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional scan locality.
  *
  * At 100 TB the scan cost of a two-predicate query is set by how well file
  * min/max statistics prune: sorting by any single column leaves the other
  * dimension scattered across every file. A Z-order (Morton) key interleaves
  * the bits of both dimensions, so `repartitionByRange(zorderKey(...))` +
  * sorted writes give every file a tight bounding box in BOTH dimensions —
  * the standard multi-dim clustering trick for data skipping.
  *
  * Pure codegen'd built-ins (shift/and/or chains — no UDF, no explode), so
  * the key computes inside WholeStageCodegen at scan speed.
  */
object Layout {

  /** Morton key interleaving the low `bits` bits of two non-negative
    * integral columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Callers bound the domain first (e.g. `col % 1024` or a
    * width-bucketed timestamp) — bits above `bits` are ignored. */
  def zorderKey(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && 2 * bits <= 62, "interleaved key must fit a long")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Driver-side reference implementation (for specs). */
  private[graft] def zorderKeyLocal(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast,
    Expression, ExpressionInfo, Literal, ShiftLeft, ShiftRight}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  /** SQL surface: `graft_zorder(x, y[, bits])` — the builder assembles the
    * same shift/and/or tree from CATALYST BUILT-IN nodes, so the SQL form
    * codegens identically to the Column form; `bits` must be an integer
    * literal (the tree shape depends on it at plan time). Registered by
    * [[graft.functions.GraftExtensions]] alongside `xid()`. */
  val zorderDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(Layout.getClass.getName, "graft_zorder"),
      (args: Seq[Expression]) => {
        val (x, y, bits) = args match {
          case Seq(a, b) => (a, b, 21)
          case Seq(a, b, Literal(n: Int, IntegerType)) if n >= 1 && 2 * n <= 62 =>
            (a, b, n)
          case _ => throw new IllegalArgumentException(
            "usage: graft_zorder(x, y[, bits INTEGER LITERAL with 2*bits <= 62])")
        }
        def interleave(e: Expression, offset: Int): Seq[Expression] = {
          val el = Cast(e, LongType)
          (0 until bits).map { i =>
            ShiftLeft(BitwiseAnd(ShiftRight(el, Literal(i)), Literal(1L)),
              Literal(2 * i + offset))
          }
        }
        (interleave(x, 0) ++ interleave(y, 1))
          .reduce[Expression]((a, b) => BitwiseOr(a, b))
      })

  /** Order-preserving IEEE-754 key: `sortableBits(a) < sortableBits(b)` iff
    * `a < b` for every non-NaN double (NaN maps above +Inf, Spark's own sort
    * order; −0.0 maps just below +0.0). The standard flip — raw bits for
    * non-negatives, lower-63-bits inverted for negatives — so RANGE
    * semantics over a continuous double domain become integer-bucket
    * semantics: `shiftright(sortableBits(s), 48)` yields ≤ 2¹⁶ monotone
    * buckets regardless of the score distribution, which is what lets
    * [[graft.ext.CurationOps.perplexityBuckets]] decompose its corpus-wide
    * cumulative count into bounded-histogram offsets + per-bucket windows
    * (round-12 verdict #2). Native codegen'd Expression (no UDF, stays in
    * WholeStageCodegen). */
  def sortableBits(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
    import org.apache.spark.sql.classic.ExpressionColumnHelper.{expr => toExpr}
    toCol(DoubleSortableBits(toExpr(c.cast("double"))))
  }

  /** Static codegen target / driver-side reference. */
  def sortableBitsLocal(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0L) b else b ^ 0x7fffffffffffffffL
  }
}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** See [[Layout.sortableBits]]. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sortable_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sortable_bits expects a double input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Layout.sortableBitsLocal(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Layout.sortableBitsLocal($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
