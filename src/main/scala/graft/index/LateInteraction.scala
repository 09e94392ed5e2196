package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020):
  * score(q, d) = Σ_{query token} max_{doc token} cos(e_q, e_d) — token-
  * level interaction instead of one pooled vector, which is what lets
  * "streams" match a document about "stream processing" without query
  * expansion. The embedding here is the engine's deterministic stand-in
  * (the V1 discipline): an md5-bucketed CHARACTER-BIGRAM profile per
  * token, L2-normalized — morphologically related tokens share bigrams
  * and score high, and any engine (incl. the DuckDB oracle) computes the
  * identical vector. A model-based token embedder plugs in through the
  * same (token → vector) seam (`udf.ModelStage`).
  *
  * Scale shape: token embeddings are computed once per DISTINCT
  * (doc, token) pair (vocab-bounded, not length-bounded), the |q| query
  * vectors ride a broadcast one-row frame into a map-side scan, the
  * per-term maxes fold in ONE map-side-combined aggregate (max is
  * reduction-order-independent), and the final top-k is
  * TakeOrderedAndProject — no global sort, no all-pairs. The per-term
  * maxes are 6-dp-rounded before ranking (the BM25 convention) and
  * summed in fixed column order, so the score is engine-exact.
  */
object LateInteraction {

  /** md5-bucketed char-bigram count vector for a single token (dim
    * buckets from the digest's first hex char); tokens shorter than 2
    * chars hash as themselves. Unnormalized counts — compose with
    * [[Embed.l2Normalize]]. */
  def charBigramVec(tok: Column, dim: Int = 16): Column = {
    require(dim == 16, "bucket = one hex char: dim is fixed at 16")
    val grams = when(length(tok) >= 2,
        transform(sequence(lit(1), length(tok) - 1), i => tok.substr(i, lit(2))))
      .otherwise(array(tok))
    aggregate(grams, array_repeat(lit(0.0), dim), (acc, g) => {
      val b = conv(substring(md5(g.cast("binary")), 1, 1), 16, 10).cast("int")
      zip_with(acc, sequence(lit(0), lit(dim - 1)),
        (x, j) => when(j === b, x + 1.0).otherwise(x))
    })
  }

  /** Late-interaction top-k: per query term the max cosine over the
    * document's distinct tokens, summed. Returns (id, sim_0..sim_n,
    * score) for the top `k` docs by score (ties → lower id). */
  def maxSimTopK(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val spark = docs.sparkSession
    val pairs = docs.select(col(idCol).as("id"),
        explode(Embed.tokens(col(textCol))).as("tok"))
      .distinct()
    // embed once per DISTINCT TOKEN (vocab-bounded — the md5-per-bigram
    // fold runs |vocab| times, not |corpus tokens| times), then join the
    // tiny vector dim back to the (doc, token) pairs
    val vocab = pairs.select("tok").distinct()
      .withColumn("e", Embed.l2Normalize(charBigramVec(col("tok"))))
    val toks = pairs.join(vocab, "tok")
    val q = spark.range(1).select(queryTerms.zipWithIndex.map { case (t, i) =>
      Embed.l2Normalize(charBigramVec(lit(t))).as(s"q_$i")
    }: _*)
    val sims = toks.crossJoin(broadcast(q))
      .select(col("id") +: queryTerms.indices.map(i =>
        round(Embed.dot(col("e"), col(s"q_$i")), 6).as(s"s_$i")): _*)
    val maxes = sims.groupBy("id")
      .agg(max(col("s_0")).as("sim_0"),
        queryTerms.indices.drop(1).map(i => max(col(s"s_$i")).as(s"sim_$i")): _*)
    val score = queryTerms.indices.map(i => col(s"sim_$i")).reduce(_ + _)
    maxes.withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
