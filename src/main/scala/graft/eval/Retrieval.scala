package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics over ranked results — the offline eval a
  * retrieval pipeline (Ask, BM25, ANN) is tuned against: recall@k, MRR,
  * and nDCG@k per query plus the macro view the caller aggregates.
  *
  * Scale shape: one equi-join of the rank-cut results against the
  * relevance table on (query, doc), then two hash aggregates keyed by
  * query — no window, no per-query collect; query count bounds every
  * intermediate. Cross-engine exactness: each DCG term 1/log2(rank+1) is
  * rounded to 9 dp and summed in DECIMAL(18,12), so the hash aggregate's
  * reduction order cannot leak into the score (the x8 rule); IDCG folds a
  * bounded sequence in fixed order on both engines.
  */
object Retrieval {

  /** Per-query metrics table: (query, n_rel, recall_at_k, mrr, ndcg).
    *
    * `ranked`: (qCol, dCol, rankCol) with rank 1-based; `relevant`:
    * (qCol, dCol) ground truth. Queries with relevant docs but no hits in
    * the top k score 0 on all three metrics; recall@k divides by the FULL
    * relevant count (the strict convention — a capped denominator
    * flatters shallow result lists). */
  def metrics(ranked: DataFrame, relevant: DataFrame, qCol: String, dCol: String,
              rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val rel = relevant.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col(rankCol) <= k)
      .join(relevant.select(col(qCol), col(dCol)), Seq(qCol, dCol))
    val perQ = hits.groupBy(col(qCol)).agg(
      count(lit(1)).as("n_hits"),
      min(col(rankCol)).as("first_rank"),
      sum(round(lit(1.0) / log2(col(rankCol) + 1), 9).cast("decimal(18,12)")).as("dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(col("n_rel"), lit(k.toLong)).cast("int")),
      lit(0.0), (acc, i) => acc + round(lit(1.0) / log2(i + 1), 9))
    rel.join(perQ, Seq(qCol), "left")
      .select(col(qCol), col("n_rel"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_rel"), 6).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("first_rank"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("dcg").cast("double"), lit(0.0)) / idcg, 6).as("ndcg"))
  }
}
