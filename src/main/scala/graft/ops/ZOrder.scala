package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout
  * primitive behind min/max data skipping on more than one predicate
  * column (Morton 1966; the technique Delta Lake's OPTIMIZE ZORDER and
  * every columnar warehouse use). A range sort clusters ONE column
  * perfectly and the second not at all; interleaving the two keys' bits
  * makes every file's (x, y) bounding box roughly square, so a selective
  * predicate on EITHER column prunes ~√F of F files instead of scanning
  * everything.
  *
  * Scale shape: the z-value is a map-only bit expression (codegen'd
  * shifts/masks, no UDF); the layout pass is ONE `repartitionByRange` on
  * that value — a single range shuffle over sampled bounds, exactly the
  * cost of any global sort-write, after which parquet row-group min/max
  * stats do the pruning forever. At 100 TB this is the difference between
  * "every query scans the lake" and "point-ish queries read a handful of
  * files".
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: x occupies even bit positions, y odd. `bits <= 31` keeps the
    * result in a positive long. Inputs must already be bounded to
    * 2^bits (bucket or mod upstream) — higher bits are ignored by
    * construction. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching DuckDB SQL for [[zValue]] — generated from the same
    * bit positions so the two engines cannot drift. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Cluster `df` into `numFiles` z-ordered output slices: one range
    * shuffle on the z-value, rows sorted by it within each slice. Written
    * with `maxRecordsPerFile` this IS the skipping layout; the z column is
    * dropped so the data schema is unchanged. */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int, numFiles: Int): DataFrame = {
    val z = df.withColumn("__zval", zValue(x, y, bits))
    z.repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
  }
}
