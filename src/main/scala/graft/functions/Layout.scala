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
}
