package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.index.{Embed, Rerank}

/** The retrieval/ask pipeline (SURVEY.md §3.2 steps 3–6 + 9–10 as one
  * lazy DataFrame; ref `backend/services/rag.py:492-792`).
  *
  * search (similarity top-k with metadata filters) → keyword rerank →
  * sigmoid-normalized score → relevance threshold filter → Q&A direct-match
  * fallback → sources projection. One QueryExecution; the only exchange is
  * the top-k (TakeOrderedAndProject, no full sort).
  *
  * The similarity stage uses the deterministic lexical embedding by default;
  * swap `scoreFn` for a dot product against a model embedding column to use
  * a real encoder (via `graft.udf.ModelStage`).
  */
object Ask {

  final case class AskConfig(
    topK: Int = 5,
    overFetch: Int = 3,              // ref fetches k*3 then cuts post-rerank
    minScore: Double = 0.25,
    semanticOnly: Double = 0.75,
    qnaAccept: Double = 0.75,
    stopwords: Seq[String] = Seq("the", "a", "of", "and", "or", "to"))

  /** Full pipeline over a (id, content, meta…) corpus for one query string. */
  def ask(corpus: DataFrame, idCol: String, contentCol: String, query: String,
          cfg: AskConfig = AskConfig(),
          metadataFilter: Column = lit(true)): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filterNot(cfg.stopwords.contains).toSeq
    val kw = Rerank.keywordScore(col(contentCol), terms, query)
    val score = Rerank.sigmoid(kw)
    val overlap = Rerank.keywordOverlap(col(contentCol), lit(query), cfg.stopwords)
    val fetched = corpus
      .filter(metadataFilter)                       // P8: pushed-down metadata filters
      .withColumn("score", score)
      .withColumn("overlap", overlap)
      .orderBy(col("score").desc, col(idCol))       // T1: TakeOrderedAndProject
      .limit(cfg.topK * cfg.overFetch)
    fetched
      .filter(Rerank.relevanceFilter(col("score"), col("overlap"), cfg.minScore, cfg.semanticOnly))
      .orderBy(col("score").desc, col(idCol))
      .limit(cfg.topK)
  }

  /** J4/A9: Q&A direct-match fallback — when retrieval returns nothing,
    * score the query against extracted Q&A pairs and accept the best match
    * above the threshold. */
  def qnaFallback(qnaPairs: DataFrame, questionCol: String, query: String,
                  accept: Double): DataFrame = {
    val sim = lit(1.0) - levenshtein(lower(col(questionCol)), lit(query.toLowerCase)).cast("double") /
      greatest(length(col(questionCol)), lit(query.length))
    qnaPairs.withColumn("match_score", sim)
      .filter(col("match_score") >= accept)
      .orderBy(col("match_score").desc)
      .limit(1)
  }

  /** Sources projection (ref `rag.py:781-790`): ranked hits → presentation
    * columns with per-chunk content caps (P11). */
  def sources(hits: DataFrame, idCol: String, contentCol: String, maxChars: Int = 3000): DataFrame =
    hits.select(col(idCol), substring(col(contentCol), 1, maxChars).as("snippet"),
      round(col("score"), 6).as("score"))
}
