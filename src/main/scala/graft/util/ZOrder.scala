package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-column pruning for the
  * lakehouse scan path. Range-sorting on ONE column (q101's layout)
  * gives tight per-file min/max stats on that column only: a predicate
  * on any OTHER column reads every file. Interleaving the bits of two
  * columns and range-sorting on the interleaved value clusters BOTH
  * dimensions at once — every file covers a small tile of the 2-D
  * space, so per-file column stats stay tight on each dimension and a
  * box (or single-dimension) predicate prunes most files via ordinary
  * parquet min/max row-group stats. This is what Delta's OPTIMIZE
  * ZORDER BY does; stock Spark has no operator for it, so it is one
  * here.
  *
  * The interleave is a shift-and-mask spread chain over the built-in
  * bitwise Column ops — pure integer arithmetic, fully inside
  * whole-stage codegen, no custom Expression needed, and exactly
  * reproducible by any engine with 64-bit shifts.
  */
object ZOrder {

  /** Bits 0..31 of `c` spread to even positions 0,2,..,62 (the classic
    * mask chain). Input is masked to its low 32 bits first. */
  def spread2(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two non-negative 32-bit values: bit i of
    * `a` at position 2i, bit i of `b` at 2i+1. Monotone in each
    * argument along the curve's tiles, which is all min/max pruning
    * needs. */
  def interleave2(a: Column, b: Column): Column =
    spread2(a).bitwiseOR(shiftleft(spread2(b), 1))

  /** Write `df` tiled along the Morton curve of (colA, colB):
    * range-partition + sort on the interleaved value (an unaliased
    * sort expression — no helper column lands in the files), one file
    * per partition, each covering a 2-D tile with tight min/max on
    * BOTH columns. Values must be non-negative and < 2^32. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, partitions: Int = 16): Unit = {
    val z = interleave2(col(colA), col(colB))
    df.repartitionByRange(partitions, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
