package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval scoring and filtering (SURVEY.md §2.6 T1/T2, §2.2 P7,
  * §2.8 F7/F8).
  *
  *  - T2 keyword rerank: ref `backend/services/rag.py:333-397` — +1 per
  *    matched term, +3 exact-phrase bonus, sigmoid-normalized.
  *  - P7 relevance filter: ref `backend/services/rag.py:69-78,245-267`.
  *  - F7 keyword overlap: ref `backend/services/rag.py:229-243` —
  *    whitespace tokenization, stopword removal, set intersection. The ref
  *    deliberately uses whitespace splitting (not a Thai tokenizer); we keep
  *    those semantics.
  */
object Rerank {

  /** F8: sigmoid 1/(1+e^-x). */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** T2 keyword score: +1 per query term found in content, +3 if the whole
    * phrase appears. Case-insensitive. */
  def keywordScore(content: Column, queryTerms: Seq[String], phrase: String): Column = {
    val lc = lower(content)
    val termHits = queryTerms.map(t => when(instr(lc, t.toLowerCase) > 0, 1.0).otherwise(0.0))
      .foldLeft(lit(0.0))(_ + _)
    termHits + when(instr(lc, phrase.toLowerCase) > 0, 3.0).otherwise(0.0)
  }

  /** F7: stopword-free keyword overlap count between a query string and
    * content (distinct-term set intersection). */
  def keywordOverlap(content: Column, query: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    val qTerms = array_except(array_distinct(filter(split(lower(query), "\\s+"), t => t =!= "")), sw)
    val cTerms = array_distinct(filter(split(lower(content), "\\s+"), t => t =!= ""))
    size(array_intersect(qTerms, cTerms))
  }

  /** P7: relevance gate — score ≥ minScore AND (overlap ≥ 1 OR score ≥
    * semanticOnly). */
  def relevanceFilter(score: Column, overlap: Column,
                      minScore: Double = 0.25, semanticOnly: Double = 0.75): Column =
    score >= minScore && (overlap >= 1 || score >= semanticOnly)

  /** T1/T2: deterministic top-k — order by score desc with a unique
    * tiebreak, then limit (plans as TakeOrderedAndProject, no full sort). */
  def topK(df: DataFrame, score: Column, tieBreak: Column, k: Int): DataFrame =
    df.orderBy(score.desc, tieBreak).limit(k)
}
