package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (prompt family:
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * All pure Catalyst expressions over a text column — codegen'd, no UDFs,
  * embarrassingly parallel (no shuffle at all until an aggregate is asked
  * for), so they scale to 100 TB as a straight map stage over the scan.
  */
object TextAnalysis {

  /** Stopword-profile language ID: score each language by hits of its
    * marker words; highest count wins (ties → lexicographic language id).
    * The n-gram-heuristic shape of fastText-style LID with a deterministic
    * marker table. */
  def languageId(text: Column, profiles: Seq[(String, Seq[String])], default: String = "und"): Column = {
    val toks = array_distinct(filter(split(lower(text), "\\s+"), t => t =!= ""))
    val scored = profiles.map { case (lang, markers) =>
      struct((-size(array_intersect(toks, array(markers.map(lit): _*)))).as("negscore"), lit(lang).as("lang"))
    }
    val best = element_at(sort_array(array(scored: _*)), 1)
    when(-best.getField("negscore") > 0, best.getField("lang")).otherwise(default)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish subword count: word-piece regex (letter runs, digit runs,
    * punctuation singles) — a deterministic proxy for tokenizer cost. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Quality score in [0,1]: blend of length band, alpha ratio, stopword
    * ratio, and mean word length band — the rule-based doc-quality shape
    * (C4/Gopher-style filters) as one expression. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val len = length(text).cast("double")
    val toks = filter(split(lower(text), "\\s+"), t => t =!= "")
    val nTok = size(toks).cast("double")
    val alphaRatio = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / greatest(len, lit(1.0))
    val swHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val swRatio = swHits / greatest(nTok, lit(1.0))
    val meanWordLen = (len - nTok + lit(1.0)) / greatest(nTok, lit(1.0))
    val lenBand = when(len >= 200 && len <= 5000, 1.0).when(len >= 50, 0.5).otherwise(0.0)
    val wordBand = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0).otherwise(0.3)
    round((lenBand * 0.3 + alphaRatio * 0.3 + least(swRatio * lit(3.0), lit(1.0)) * 0.2 + wordBand * 0.2), 6)
  }

  /** Document fingerprint: minimum md5 over rolling word shingles — a
    * 1-hash MinHash usable as a near-dup blocking key. */
  def fingerprint(text: Column, shingleWidth: Int = 4): Column =
    array_min(transform(Dedup.wordShingles(text, shingleWidth), s => md5(s)))
}
