package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout helpers for multi-dimensional scan pruning — the
  * lakehouse Z-ORDER technique (public: Databricks OPTIMIZE ZORDER,
  * Apache Iceberg/Hudi clustering): interleave the bits of two bucket
  * coordinates into one Morton value, sort/partition the table by it,
  * and range pruning on the z-value bounds BOTH dimensions at once —
  * each parquet row group then covers a small rectangle of the
  * (x, y) space instead of a full stripe, so min/max statistics prune
  * scans with predicates on EITHER column.
  *
  * The reference engine has no layout control (single-node pandas);
  * this is part of the 100 TB extension surface: at cluster scale the
  * difference between "query reads 2% of row groups" and "query reads
  * 100%" IS the layout.
  *
  * Implementation is pure integer arithmetic (shifts/masks summed over
  * a fixed bit width), so it is whole-stage-codegen'd, shuffle-free,
  * and exactly reproducible in any engine — the t48 oracle replays it
  * in SQL verbatim. */
object Layout {

  /** Morton (Z-curve) interleave of two non-negative bucket ids over
    * `bits` bits each: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. Out-of-range coordinates are masked into range (callers
    * bucket first; masking keeps the expression total). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xb = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val yb = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Hilbert index of two non-negative bucket ids — the
    * locality-better curve (every step is grid distance 1, no Z-curve
    * jumps, so a value range bounds a tighter rectangle). Backed by
    * the native [[graft.expr.GraftHilbert]] kernel: the per-bit
    * rotation recurrence feeds each level's x/y into the next twice,
    * which makes an unrolled Column tree exponential in `bits` — the
    * codegen'd loop is O(bits) per row. */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column =
    call_function("graft_hilbert", x.cast("long"), y.cast("long"), lit(bits))
}
