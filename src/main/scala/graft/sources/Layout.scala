package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) interleaving.
  *
  * A sort on ONE column gives perfect data skipping on that column and
  * none on any other; interleaving the bits of two quantized columns
  * gives a total order whose contiguous ranges are quad-tree cells —
  * every file/bucket then carries a TIGHT min/max span on BOTH columns,
  * so scans filtered on either dimension prune most of the layout
  * (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Scale shape: the code is a per-row integer expression (codegen'd, no
  * shuffle of its own); the layout materializes with one
  * `repartitionByRange(morton)` — the same single exchange a plain sort
  * costs. Reference analogue: the layout/pruning concerns of the
  * columnar scan path (deeptime streams trajectories off contiguous
  * npy blocks; at 100 TB the equivalent lever is which parquet
  * row-groups a predicate has to touch at all).
  */
object Layout {

  /** Morton code of two non-negative integer columns, `bits` bits each:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Pure
    * integer shifts/masks — exact in any engine. */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
}
