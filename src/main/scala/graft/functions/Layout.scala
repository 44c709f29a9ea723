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
}
