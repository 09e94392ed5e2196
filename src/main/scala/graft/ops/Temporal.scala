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
    require(rightVals.intersect(leftPayload ++ keys).isEmpty,
      s"rightVals collide with left columns: ${rightVals.intersect(leftPayload ++ keys).mkString(", ")}")
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
    // carry the latest right ROW as one struct: a right row always yields a
    // non-null struct even when its value columns are null, so a genuine
    // NULL value is carried (not skipped for a stale older one) and all
    // rightVals come from the SAME matched row — per-column
    // last(ignoreNulls) would violate both
    val rowCarry = last(
      when(col("_side") === 0, struct(rightVals.map(col): _*)), ignoreNulls = true).over(w)
    l.unionByName(r)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        rightVals.map(c => rowCarry.getField(c).as(c)) :+ col("_side"): _*)
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
    * `tsCol`/`startCol`/`endCol` are NON-NEGATIVE epoch-µs longs (cast
    * timestamps with `unix_micros` first); `maxLen` must bound every
    * interval's length. Buckets use integer `div`, never double division —
    * epoch-nanos magnitudes exceed 2^53, where a double floor(x/m) can
    * land a point one bucket off and silently miss containing intervals. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                tsCol: String, startCol: String, endCol: String, maxLen: Long): DataFrame = {
    require(!(points.columns ++ intervals.columns).contains("_b"), "rangeJoin reserves _b")
    val p = points.withColumn("_b", expr(s"$tsCol div ${maxLen}L"))
    // empty intervals would make `sequence` run DESCENDING (wrong buckets);
    // they can match nothing, so drop them. Intervals longer than maxLen
    // stay correct (sequence covers every spanned bucket) — maxLen only
    // bounds the explosion factor.
    val i = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(expr(s"$startCol div ${maxLen}L"),
        expr(s"($endCol - 1) div ${maxLen}L"))))
    p.join(i, Seq("_b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_b")
  }

  /** Keyed recent-event pairing — the BATCH form of a stream-stream
    * interval join: pair every left row with the right rows of the SAME
    * key whose timestamp lies in `[leftTs - windowUs, leftTs]` (inclusive
    * both ends, matching Spark's stream-stream `BETWEEN` join condition;
    * `stream.Ingest.streamStreamJoin` runs the identical predicate
    * incrementally under watermarks). Timestamps are epoch-µs longs.
    *
    * Shape: the naive formulation (equi-join on key + range predicate) is
    * fine when the key is selective, but a hot key degenerates toward
    * per-key quadratic work; bucketing by `windowUs` bounds each right
    * row's replication at exactly 2 (its own bucket and the next — a
    * look-back interval of width `windowUs` spans at most two buckets)
    * and lets the range predicate run inside (key, bucket) groups. Same
    * integer-`div` discipline as [[rangeJoin]]. */
  /** Keyed interval-overlap join: pair every left interval `[lS, lE)`
    * with the right intervals `[rS, rE)` of the same key that OVERLAP it
    * (`lS < rE && rS < lE`) — the alignment primitive of A/V-segment and
    * session-incident analysis (and the interval analog of [[rangeJoin]]'s
    * point-in-interval). Bucketed the same way: both sides explode to the
    * width-`maxLen` buckets they span, the join runs on (key, bucket).
    * Overlapping intervals can SHARE several buckets, so the filter keeps
    * only the canonical meeting bucket — the one containing
    * `greatest(lS, rS)`, which overlap guarantees lies inside both
    * intervals — making each pair appear exactly once with no post-join
    * dedup. `maxLen` must bound every interval's length on BOTH sides to
    * cap replication (an interval explodes to ≤ 2 buckets when its length
    * is ≤ maxLen; longer intervals stay correct, just wider). Bounds are
    * non-negative epoch-µs longs; empty intervals (`end <= start`) match
    * nothing and are dropped (Spark's `sequence` would count DOWN). */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
                  lStart: String, lEnd: String, rStart: String, rEnd: String,
                  maxLen: Long): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(!(left.columns ++ right.columns).contains("_b"), "overlapJoin reserves _b")
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("_b", explode(sequence(expr(s"$lStart div ${maxLen}L"),
        expr(s"($lEnd - 1) div ${maxLen}L"))))
    val r = right.filter(col(rEnd) > col(rStart))
      .withColumn("_b", explode(sequence(expr(s"$rStart div ${maxLen}L"),
        expr(s"($rEnd - 1) div ${maxLen}L"))))
    l.join(r, Seq(key, "_b"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("_b") === expr(s"greatest($lStart, $rStart) div ${maxLen}L"))
      .drop("_b")
  }

  def recentPairs(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(!(left.columns ++ right.columns).contains("_b"), "recentPairs reserves _b")
    val l = left.withColumn("_b", expr(s"$leftTs div ${windowUs}L"))
    val r = right.withColumn("_b",
      explode(array(expr(s"$rightTs div ${windowUs}L"), expr(s"$rightTs div ${windowUs}L + 1"))))
    l.join(r, Seq(key, "_b"))
      .filter(col(rightTs) >= col(leftTs) - windowUs && col(rightTs) <= col(leftTs))
      .drop("_b")
  }
}
