package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout: sort
  * a table by the bit-interleave of two dimension keys and CONSECUTIVE
  * ranges of rows (= files, at write time) span bounded rectangles in
  * BOTH dimensions — so file-level min/max statistics prune scans
  * filtered on either dimension, where a lexicographic (a, b) sort
  * prunes only on `a`. The lakehouse layout trick (Databricks Delta's
  * OPTIMIZE ZORDER, Hudi/Iceberg z-ordering), built here from plain
  * codegen'd integer arithmetic — the classic magic-number bit spread,
  * no UDF.
  *
  * [[interleave16]] maps two dimensions already reduced to 16-bit
  * buckets (0..65535 — callers bucket raw values first; 2^16 per side
  * is plenty for file-pruning granularity) onto a 32-bit z-value.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,..,30:
    * four shift-or-mask rounds (masks are the standard Morton-code
    * constants). Pure long arithmetic — identical in any engine. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit bucket columns: a's bits on even
    * positions, b's on odd. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The table in z-order layout: range-partitioned and sorted by the
    * interleave of the two bucket columns (id tie-break keeps the order
    * total). Write the result to get z-clustered files whose min/max
    * span bounded rectangles in both dimensions. */
  def zSorted(df: DataFrame, bucketA: Column, bucketB: Column,
              tieBreak: Column, partitions: Int): DataFrame =
    df.withColumn("_z", interleave16(bucketA, bucketB))
      .repartitionByRange(partitions, col("_z"), tieBreak)
      .sortWithinPartitions(col("_z"), tieBreak)
      .drop("_z")
}
