package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Sorting a table by one column gives parquet min/max row-group pruning
  * on that column only — a second filter dimension reads every row group
  * the first admits (LayoutSkippingSpec). Interleaving the bits of both
  * columns into one Morton key and sorting by THAT gives each dimension
  * partial locality, so a 2-D box predicate prunes multiplicatively
  * instead of on one axis. This is the standard lakehouse Z-ORDER
  * clustering technique, built here from Spark bitwise built-ins only
  * (shiftleft / & / | — whole-stage-codegen'd, no UDF).
  *
  * At 100 TB: combine with `repartitionByRange(zvalue)` so file-level
  * min/max prune first, then row-group stats within files; the write
  * stays a single range shuffle.
  */
object Layout {

  /** Spread the low 16 bits of x to even bit positions (0→0, 1→2, …,
    * 15→30) via the classic mask-and-shift doubling steps.
    */
  def spread16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton key: bits of `a` at even positions, `b` at odd. Inputs
    * must already be scaled to 16-bit range (callers bucket/clamp first).
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` Z-clustered on two 16-bit-ranged columns: range-partition
    * then sort-within-partitions by the Morton key, so both file-level
    * and row-group-level min/max statistics align with the curve.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 1, options: Map[String, String] = Map.empty): Unit = {
    val z = zValue2(col(colA), col(colB)).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.options(options).parquet(path)
  }
}
