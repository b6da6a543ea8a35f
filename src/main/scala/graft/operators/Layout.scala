package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional file skipping.
  *
  * At 100 TB the scan cost of a selective query is decided before it runs —
  * by how the writer laid rows into files. Sorting on one column gives
  * perfect min/max pruning on that column and none on any other; the
  * Z-order (Morton) curve interleaves the bits of several columns so that
  * curve-contiguous row runs are small RECTANGLES of the key space, and
  * every file's parquet min/max footer stays narrow on every interleaved
  * dimension at once. A writer that range-partitions + sorts on the
  * z-value (the standard OPTIMIZE ... ZORDER BY move) lets a predicate on
  * ANY of the dimensions skip most files at planning time.
  *
  * The interleave itself is a pure map-side bit expression — unrolled
  * shift/mask terms that whole-stage codegen fuses into the scan; no
  * shuffle, no UDF.
  */
object Layout {

  /** Morton (Z-curve) interleave of two `bits`-bit non-negative columns:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1. */
  def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftrightunsigned(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
}
