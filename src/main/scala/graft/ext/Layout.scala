package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan pruning.
  *
  * The 100-TB problem: parquet min/max stats prune a scan on ONE sort
  * dimension; a query filtering on a second dimension reads everything.
  * Interleaving the bits of two dimensions into one Morton key and
  * range-partitioning + sorting on it clusters BOTH dimensions at once —
  * every file then covers a tight (x, y) rectangle, so min/max stats on
  * x AND y are simultaneously selective.
  *
  * The interleave is pure column algebra (shift/mask/or — the classic
  * magic-number spread), so it rides inside whole-stage codegen, pushes
  * nothing to the driver, and any engine can replay the key derivation
  * bit-for-bit in SQL.
  */
object Layout {

  /** Spread the low 16 bits of a non-negative LONG so bit i lands at
    * bit 2i (zeros interleaved between). */
  def spreadBits16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions (x in even bits, y odd). */
  def zValue2(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Range-partition and sort `df` by the Morton key of (xCol, yCol), each
    * quantized to 16 bits — the layout step before a write. `buckets` maps
    * to output files/partitions; parquet stats per file then bound a tight
    * rectangle in both source dimensions. */
  def zOrdered(df: DataFrame, xCol: Column, yCol: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val z = zValue2(xCol, yCol).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
