package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval (Robertson/Lucene form) over a text corpus —
  * the classical lexical complement to the vector paths in [[Search]]
  * (ref ranks retrieved chunks by keyword overlap in
  * backend/services/rag.py:188-214; BM25 is the corpus-statistics-aware
  * version of that score).
  *
  * Two-phase plan built for scale: phase 1 aggregates the corpus stats the
  * score needs — doc count, average doc length, per-term document
  * frequency — into ONE row (a full scan with a map-side partial agg, no
  * wide shuffle); phase 2 broadcasts that row and scores every document in
  * a map-only scan, then takes the global top-k via
  * `TakeOrderedAndProject`. At 100 TB the stats row is bytes, is computed
  * once per corpus snapshot (not per query), and the scoring pass is
  * embarrassingly parallel — no inverted index is materialized, which is
  * the right trade when queries are few and the corpus churns; a stable
  * corpus + high query volume would instead persist phase 1's stats table.
  *
  * Determinism: all inputs to the floating-point score are exact integers
  * (tf, df, dl, N), `avgdl` is an exact-integer sum divided once, and the
  * per-term expression tree is fixed, so any engine building the same tree
  * reproduces the score bit-for-bit (the DuckDB oracle does).
  */
object Bm25 {

  /** Lowercase whitespace tokens with empties dropped — the same tokenize
    * every shingle/LM build uses (delegates to the single shared
    * construction, `TextAnalysis.tokens`). */
  def tokens(text: Column): Column = graft.ops.TextAnalysis.tokens(text)

  /** One-row corpus statistics: `n_docs`, `avgdl` (double), and `df_i` for
    * each query term, in term order. The token array is bound to an
    * attribute first — inlining the tokenize tree into avgdl plus every
    * df aggregate would re-tokenize each document terms+1 times. */
  def corpusStats(docs: DataFrame, textCol: Column, terms: Seq[String]): DataFrame = {
    val toks = col("__bm25_toks")
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl")) ++ dfAggs
    docs.withColumn("__bm25_toks", tokens(textCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** BM25 with a RUNTIME term set — the inverted-index join shape
    * ([[topK]]'s per-term stats columns need compile-time terms; a
    * pseudo-relevance-feedback loop does not know its terms until it has
    * retrieved): postings = explode(tokens), semi-joined to the
    * broadcast term set, per-(doc, term) tf and per-term df as hash
    * aggregates, then per-doc score summation. Because a groupBy sum has
    * no fixed operand order, each term's contribution is cast to
    * DECIMAL(25,15) before summing (order-independent, the d9
    * discipline) — the static [[topK]] instead fixes the order in its
    * expression tree. `termsDf` must have one `term` column. */
  def topKDynamic(docs: DataFrame, idCol: String, textCol: String, termsDf: DataFrame,
                  k: Int, k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    val base = docs.select(col(idCol).as("_bid"), tokens(col(textCol)).as("toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      (sum(size(col("toks"))).cast("double") / count(lit(1))).as("avgdl"))
    val dl = base.select(col("_bid"), size(col("toks")).cast("double").as("dl"))
    val posts = base.select(col("_bid"), explode(col("toks")).as("term"))
    val tf = posts.join(broadcast(termsDf), "term")
      .groupBy("_bid", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + 0.5)
      / (col("df").cast("double") + 0.5))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfT), "term").join(dl, "_bid").crossJoin(broadcast(stats))
      .select(col("_bid"), contrib.as("contrib"))
      .groupBy("_bid")
      .agg(round(sum(col("contrib").cast("decimal(25,15)")).cast("double"), roundTo).as("bm25"))
      .filter(col("bm25") > 0.0)
      .select(col("_bid").as(idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Batched multi-query BM25 — the production retrieval shape
    * ([[topKDynamic]] serves ONE query; an eval harness, a hard-negative
    * miner, or an online service scores thousands): one corpus pass
    * serves every query. Postings tokenize once and semi-join the union
    * of all query terms; per-(doc, term) tf and per-term df are shared
    * across queries (a term appearing in many queries is counted once);
    * the per-(query, doc) score fan-out happens via a broadcast of the
    * bounded (qid, term) map; and the per-query top-k is a rank window
    * PARTITIONED BY qid — Spark's rank-limit pushdown turns it into
    * WindowGroupLimit per-partition heaps, so no global sort and no
    * unpartitioned window exists at any corpus size (the PlanSpec
    * invariant). Contributions sum in DECIMAL (groupBy order freedom, the
    * topKDynamic discipline). `queries` carries `(qidCol, queryCol)`;
    * output `(qidCol, idCol, bm25, rank)` with rank 1..k per query. */
  def topKBatch(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qidCol: String, queryCol: String,
                k: Int, k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    val base = docs.select(col(idCol).as("_bid"), tokens(col(textCol)).as("toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      (sum(size(col("toks"))).cast("double") / count(lit(1))).as("avgdl"))
    val qterms = queries.select(col(qidCol).as("_qid"),
      explode(array_distinct(tokens(col(queryCol)))).as("term"))
    val dl = base.select(col("_bid"), size(col("toks")).cast("double").as("dl"))
    val posts = base.select(col("_bid"), explode(col("toks")).as("term"))
    val tf = posts.join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("_bid", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + 0.5)
      / (col("df").cast("double") + 0.5))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf.join(broadcast(qterms), "term")
      .join(broadcast(dfT), "term").join(dl, "_bid").crossJoin(broadcast(stats))
      .select(col("_qid"), col("_bid"), contrib.as("contrib"))
      .groupBy("_qid", "_bid")
      .agg(round(sum(col("contrib").cast("decimal(25,15)")).cast("double"), roundTo).as("bm25"))
      .filter(col("bm25") > 0.0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_qid")
      .orderBy(col("bm25").desc, col("_bid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("_qid").as(qidCol), col("_bid").as(idCol), col("bm25"), col("rank"))
  }

  /** RM3-style expansion terms from a feedback set `(idCol, score)`:
    * each candidate term (length ≥ `minLen`, not a seed) scores
    * `Σ_d (tf_td / dl_d) · score_d` — relevance-weighted relative
    * frequency (Lavrenko/Croft relevance models, the Anserini RM3
    * default's shape) — summed in DECIMAL, top `n` by (6-dp score, term).
    * All inputs to the weight are exact doubles, so both engines rank
    * identically. */
  def rm3ExpansionTerms(docs: DataFrame, idCol: String, textCol: String,
                        feedback: DataFrame, seeds: Seq[String],
                        n: Int, minLen: Int = 4): DataFrame = {
    val base = docs.select(col(idCol).as("_bid"), tokens(col(textCol)).as("toks"))
    val fb = feedback.select(col(idCol).as("_bid"), col("bm25").as("s"))
    val fbToks = base.join(broadcast(fb), "_bid")
      .select(col("_bid"), col("s"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .filter(length(col("term")) >= minLen && !col("term").isin(seeds: _*))
    fbToks.groupBy("_bid", "term", "s", "dl").agg(count(lit(1)).cast("double").as("tf"))
      .select(col("term"), ((col("tf") / col("dl")) * col("s")).as("w"))
      .groupBy("term")
      .agg(sum(col("w").cast("decimal(25,15)")).cast("double").as("w"))
      .orderBy(round(col("w"), 6).desc, col("term"))
      .limit(n)
      .select("term")
  }

  /** Score every document against `terms` and keep the global top `k`
    * (score desc, id asc; zero-scoring docs — no term present — dropped).
    * `k1`/`b` are the standard free parameters. The score is rounded to
    * `roundTo` decimals BEFORE ranking so sub-rounding libm drift in `ln`
    * between engines cannot reorder the top-k cutoff — ties at that
    * precision break on the id in every engine. */
  def topK(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k: Int, k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    val stats = corpusStats(docs, col(textCol), terms)
    // bind toks to an attribute: inlined, the tokenize tree would be
    // re-evaluated in dl and in every per-term tf
    val toks = col("__bm25_toks")
    val dl = size(toks).cast("double")
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, x => x === t)).cast("double")
      // Lucene idf: ln(1 + (N - df + 0.5) / (df + 0.5)) — always positive
      val idf = log(lit(1.0) + (col("n_docs").cast("double") - col(s"df_$i").cast("double") + 0.5)
        / (col(s"df_$i").cast("double") + 0.5))
      idf * (tf * lit(k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    }
    docs.withColumn("__bm25_toks", tokens(col(textCol)))
      .crossJoin(broadcast(stats))
      .withColumn("bm25", round(perTerm.reduce(_ + _), roundTo))
      .filter(col("bm25") > 0.0)
      .select(col(idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }
}
