package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combining a lexical (BM25) and a dense
  * (embedding) ranking into one list — the standard production retrieval
  * stack (ref's rag.py retrieves by vector then re-scores by keyword
  * overlap; RRF is the published, score-scale-free way to do that merge —
  * Cormack/Clarke/Buettcher, SIGIR'09).
  *
  * Scale shape: each input ranking is already a bounded top-N (corpus-side
  * work is BM25's one-pass stats scan and ANN's index probe — both
  * scale-safe on their own); fusion itself therefore only ever touches
  * O(N) rows per query. RRF's rank derivation reuses
  * [[graft.ops.TableOps.broadcastTopRank]] (bounded broadcast self-join,
  * no unpartitioned WindowExec), and the greedy MMR loop runs k bounded
  * iterations over an N-row localCheckpoint'd candidate frame — corpus
  * scale never re-enters after candidate generation.
  *
  * Determinism: RRF scores are sums of exactly two `1/(k0+rank)` terms
  * (integer ranks → bit-exact in any engine); MMR rounds every similarity
  * and every greedy score to fixed decimals BEFORE each argmax so libm
  * drift cannot reorder selections, and ties break on id.
  */
object Fusion {

  /** Reciprocal-rank fusion of two bounded rankings. Inputs carry
    * `(idCol, rankCol)` with ranks 1..N; output is
    * `(idCol, rank_a, rank_b, rrf)` where absent ids contribute 0 to the
    * fused score (full outer join — a doc ranked by only one retriever
    * still fuses). */
  def rrf(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          k0: Int = 60): DataFrame = {
    val ra = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val rb = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_a").cast("double")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_b").cast("double")), lit(0.0))).as("rrf"))
  }

  /** Maximal-marginal-relevance selection (Carbonell/Goldstein, SIGIR'98):
    * greedily pick `k` of the candidates, each step maximizing
    * `lambda * rel - (1 - lambda) * max sim(cand, selected)`.
    *
    * `cands` carries `(idCol, relCol, vecCol)` and MUST already be a
    * bounded top-N (the corpus-scale cut happens upstream in BM25/ANN) —
    * the N×N cosine matrix and the k greedy steps are then constant-size
    * regardless of corpus. Every sim and every step score is rounded to
    * `roundTo` decimals before comparison; argmax ties break on id asc.
    * Returns `(step, idCol, mmr)` — selection order 1..k. */
  def mmr(cands: DataFrame, idCol: String, relCol: String, vecCol: String,
          k: Int, lambda: Double = 0.7, roundTo: Int = 6): DataFrame = {
    val c = cands.select(col(idCol).as("_mid"), col(relCol).cast("double").as("_rel"),
      col(vecCol).as("_vec")).localCheckpoint()
    // bounded N×N cosine matrix, computed once (broadcast right side)
    val sims = c.crossJoin(broadcast(c.select(col("_mid").as("_jid"), col("_vec").as("_jvec"))))
      .filter(col("_mid") =!= col("_jid"))
      .select(col("_mid"), col("_jid"),
        round(Embed.dot(col("_vec"), col("_jvec")) /
          (sqrt(Embed.dot(col("_vec"), col("_vec"))) * sqrt(Embed.dot(col("_jvec"), col("_jvec")))),
          roundTo).as("_sim"))
      .localCheckpoint()
    val lam = lit(lambda)
    var selected: DataFrame = null
    for (step <- 1 to k) {
      val scored =
        if (selected == null) c.withColumn("_pen", lit(0.0))
        else c.join(broadcast(selected.select("_mid")), Seq("_mid"), "left_anti")
          .join(
            sims.join(broadcast(selected.select(col("_mid").as("_jid"))), "_jid")
              .groupBy("_mid").agg(max(col("_sim")).as("_pen")),
            Seq("_mid"), "left")
          .withColumn("_pen", coalesce(col("_pen"), lit(0.0)))
      val pick = scored
        .select(col("_mid"), round(lam * col("_rel") - (lit(1.0) - lam) * col("_pen"), roundTo).as("_mmr"))
        .orderBy(col("_mmr").desc, col("_mid"))
        .limit(1)
        .withColumn("_step", lit(step))
        .localCheckpoint()
      selected = if (selected == null) pick else selected.unionByName(pick)
    }
    selected.select(col("_step").as("step"), col("_mid").as(idCol), col("_mmr").as("mmr"))
  }
}
