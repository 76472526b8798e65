package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) layout clustering — the standard lakehouse
  * technique for making file/row-group statistics useful on MORE THAN
  * ONE column: interleaving the bits of two key columns gives a 1-D
  * sort key whose contiguous ranges are small RECTANGLES in (a, b)
  * space, so every file written in z-order carries tight min/max on
  * BOTH columns and a predicate on either (or both) prunes files. A
  * layout sorted on one column prunes only that column; at 100 TB the
  * difference is reading ~√F of the files for a 2-D predicate instead
  * of all of them.
  *
  * The z-value is a pure integer Column expression (shift/mask/add —
  * whole-stage codegen, zero shuffle to compute); the layout write is
  * one range-repartition + in-partition sort, the same one-time cost
  * discipline as [[Bucketing]]. ZOrderSpec certifies the locality
  * property from the written files' own stats: per-file min/max
  * rectangles, and would-be-scanned file counts under 1-D and 2-D
  * predicates vs a single-column-sorted layout of the same data.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns into a `2·bits`-bit z-value: bit i of `a` lands at 2i, bit
    * i of `b` at 2i+1.
    */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The DuckDB-side mirror of [[zorder2]] for oracle SQL: the same
    * shift/mask/add term per bit, generated textually.
    */
  def zorder2Sql(aExpr: String, bExpr: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($aExpr) >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((($bExpr) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Write `df` clustered on the z-value of (`aCol`, `bCol`) into
    * `numFiles` parquet files: range-partition on the z-value (so files
    * own contiguous curve segments = small rectangles), sort within each
    * file (so row groups subdivide the rectangle further).
    */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val z = zorder2(col(aCol), col(bCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
