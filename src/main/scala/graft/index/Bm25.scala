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
