package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (brief §custom-operators;
  * the as-of join is the canonical example). Composed from existing ops —
  * preference (a) of the custom-operator ladder — rather than a custom
  * SparkPlan: the union+window formulation is a single shuffle on the key
  * plus one in-partition sort, which is exactly the minimum any as-of
  * implementation must pay, so a bespoke physical operator would buy
  * nothing at 100 TB.
  */
object Temporal {

  /** As-of join: each left row picks up `rightVals` from the LATEST right
    * row of the same key with `rightTs` ≤ `leftTs` (inclusive, DuckDB
    * ASOF semantics); left rows with no prior right row keep nulls.
    *
    * Shape: tag both sides, union, one window over (key, ts, side) with
    * `last(ignoreNulls)` carrying right values forward — right rows sort
    * BEFORE left rows at equal ts, which is what makes the match
    * inclusive. Requires right to be unique per (key, rightTs): pre-reduce
    * duplicates (e.g. `groupBy(key, ts).agg(max(...))`) or the carried
    * value is order-dependent. Column names must not collide with the
    * internal `_ts`/`_side` tags.
    *
    * At scale: partitions are per-key — cardinality grows with the data,
    * so no partition outgrows an executor; both inputs shuffle once on
    * the key and nothing is broadcast or replicated. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    require(!(left.columns ++ right.columns).exists(c => c == "_ts" || c == "_side"),
      "asofJoin reserves _ts/_side")
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side")) ++
        leftPayload.map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        rightVals.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+ col("_side"): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Keyless interval-containment join: pair every point with every
    * interval containing it (`start ≤ ts < end`). Without a key, Spark
    * plans an inequality join as BroadcastNestedLoopJoin — O(N·M) and a
    * driver OOM at scale. The bucket trick makes it an equi-join: points
    * land in ONE bucket of width `maxLen`; an interval of length ≤ maxLen
    * spans at most two buckets and is exploded into each; the bucket
    * equi-join then shuffles O(N + 2M) rows and the exact predicate
    * filters within buckets. Each (point, interval) pair meets in exactly
    * one bucket — the point's — so no post-join dedup is needed.
    *
    * `tsCol`/`startCol`/`endCol` are epoch-µs longs (cast timestamps with
    * `unix_micros` first); `maxLen` must bound every interval's length. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                tsCol: String, startCol: String, endCol: String, maxLen: Long): DataFrame = {
    val p = points.withColumn("_b", floor(col(tsCol) / maxLen))
    // empty intervals would make `sequence` run DESCENDING (wrong buckets);
    // they can match nothing, so drop them. Intervals longer than maxLen
    // stay correct (sequence covers every spanned bucket) — maxLen only
    // bounds the explosion factor.
    val i = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(floor(col(startCol) / maxLen),
        floor((col(endCol) - 1) / maxLen))))
    p.join(i, Seq("_b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_b")
  }
}
