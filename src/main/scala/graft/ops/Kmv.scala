package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007) — the [[Hll]] ledger's companion when the pipeline
  * needs the SAMPLE, not just the count: the k minimum md5 values of the
  * distinct item stream per key. Like every signature in this engine it is
  * md5-derived, so any engine (including the DuckDB oracle) computes the
  * bit-identical sketch — storable, diffable, and mergeable with plain SQL.
  *
  * Properties the queries gate on:
  *  - EXACT merge algebra: bottom-k of the union of part bottom-k sketches
  *    IS the bottom-k of the whole stream (any global bottom-k hash is
  *    within its own part's bottom-k) — not approximately, exactly. Part
  *    sketches are k rows each, so incremental / per-batch / per-day
  *    maintenance shuffles k·parts rows, never the corpus.
  *  - Small keys are EXACT: a key holding fewer than k hashes has its true
  *    distinct count (the sketch saw every distinct item).
  *  - Large keys estimate (k−1)/v_k where v_k = the k-th minimum as a
  *    fraction of the hash space (first 48 md5 bits).
  *  - The sketch doubles as a uniform distinct-item SAMPLE (min-hashes are
  *    a uniform draw over distinct items) — the basis for Jaccard-style
  *    overlap audits between corpus snapshots, which registers-only HLL
  *    cannot do.
  *
  * Scale: the one-shot [[sketch]] ranks per key after a distinct — at
  * 100 TB build PART sketches keyed (key, shard) instead and [[merge]]
  * them: each window then ranks one shard's distinct stream, and the merge
  * input is k rows per shard. The sk3 query gates exactly that two-level
  * path against the one-shot sketch.
  */
object Kmv {

  val k = 64
  /** 16^12 = 2^48, the hash-space size of the 12-hex-char estimator prefix. */
  val space: Double = 281474976710656.0

  /** Bottom-k sketch rows (keys..., pos, h) over the DISTINCT item stream:
    * pos in [1, min(k, distinct)] ranks the md5 hex ascending. */
  def sketch(df: DataFrame, keyNames: Seq[String], item: Column, k: Int = k): DataFrame = {
    val kcols = keyNames.map(col)
    val dv = df.select(kcols :+ item.as("_w"): _*).distinct()
    val w = Window.partitionBy(kcols: _*).orderBy(col("h"))
    dv.select(kcols :+ md5(col("_w").cast("binary")).as("h"): _*)
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
  }

  /** Merge part sketches (keys..., h) into the sketch of the union —
    * EXACT: dedup shared hashes, re-rank, keep the bottom k. */
  def merge(parts: DataFrame, keyNames: Seq[String], k: Int = k): DataFrame = {
    val kcols = keyNames.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy(col("h"))
    parts.select(kcols :+ col("h"): _*).distinct()
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
  }

  /** Per-key distinct estimate from a sketch: exact count below k, else
    * (k−1)/v_k from the k-th minimum's 48-bit prefix. One aggregate over
    * ≤ keys×k rows. */
  def estimate(sk: DataFrame, keyNames: Seq[String], k: Int = k): DataFrame = {
    val kcols = keyNames.map(col)
    val agg = sk.groupBy(kcols: _*).agg(count(lit(1)).as("n_held"), max(col("h")).as("h_k"))
    val vk = conv(substring(col("h_k"), 1, 12), 16, 10).cast("long")
    val est = when(col("n_held") < k, col("n_held").cast("double"))
      .otherwise(lit((k - 1).toDouble) / (vk.cast("double") / lit(space)))
    agg.select(kcols :+ round(est, 4).as("est_distinct"): _*)
  }
}
