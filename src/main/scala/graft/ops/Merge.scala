package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands / sessionization operators (SURVEY.md §2.5 W2, §2.4 A5).
  *
  * The reference folds consecutive page blocks into merged paragraphs
  * (`ingestion/pdf_parser.py:184-254`): a stateful linear scan. The Spark-first
  * form is the classic gaps-and-islands pattern — `lag` over a per-partition
  * ordered window yields a break flag, a running `sum` of the flag yields the
  * group id, and a hash aggregate performs the A5 metadata rollup. One shuffle
  * (by partition key), scales linearly with input.
  */
object Merge {

  /** W2: assign an island/group id per partition. `breakFlag` must be 1 on
    * rows that start a new group (computed against `lag` columns) and 0
    * otherwise. */
  def islandId(df: DataFrame, partCols: Seq[Column], orderCol: Column, breakFlag: Column,
               out: String = "group_id"): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(breakFlag).over(w))
  }

  /** Time-gap sessionization: new session when the gap from the previous
    * event exceeds `gapSeconds`. Returns the frame with a `session_id`
    * column (1-based per partition). */
  def sessionize(df: DataFrame, partCols: Seq[Column], ts: Column, tieBreak: Column,
                 gapSeconds: Long, out: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(ts, tieBreak)
    val prev = lag(ts, 1).over(w)
    // compare at microsecond precision (timestamps are µs-exact after the
    // parquet read; second-truncation would misclassify fractional gaps)
    val isBreak = when(prev.isNull || unix_micros(ts) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    // the running sum must use the same (ts, tieBreak) order as the lag —
    // ordering by ts alone makes session ids nondeterministic on tied
    // timestamps
    islandId(df.withColumn("_brk", isBreak), partCols, struct(ts, tieBreak), col("_brk"), out)
      .drop("_brk")
  }

  /** A5: merged-group metadata union — content concatenation in order,
    * bbox-style envelope (min/min/max/max), distinct tag union. Apply after
    * `islandId`; caller supplies the group key columns. */
  def mergeGroups(df: DataFrame, keyCols: Seq[Column], orderCol: Column, content: Column,
                  tags: Column, x0: Column, y0: Column, x1: Column, y1: Column,
                  sep: String = "\n"): DataFrame =
    df.groupBy(keyCols: _*).agg(
      concat_ws(sep, sort_array(collect_list(struct(orderCol.as("o"), content.as("c")))).getField("c")).as("content"),
      array_distinct(flatten(collect_list(tags))).as("tags"),
      min(x0).as("x0"), min(y0).as("y0"), max(x1).as("x1"), max(y1).as("y1"),
      count(lit(1)).as("n_parts"))
}
