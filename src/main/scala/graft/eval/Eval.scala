package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Golden-set eval harness (SURVEY.md §3.3, §2.3 J6, §2.4 A8; ref
  * `backend/scripts/run_eval.py`).
  *
  * questions → answer stage → judge stage → grouped rollup, as a 1:1 staged
  * pipeline (no shuffle until the final rollup). The ref's LLM judge is a
  * pluggable `graft.udf.ModelStage`; the native deterministic judge is
  * normalized-containment scoring (the ref's own fallback shape).
  */
object Eval {

  /** Deterministic judge: 5 if the normalized truth string is contained in
    * the answer, 3 if ≥half of its tokens appear, else 1. */
  def judgeScore(answer: org.apache.spark.sql.Column, truth: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val normA = lower(regexp_replace(answer, "\\s+", " "))
    val normT = lower(regexp_replace(truth, "\\s+", " "))
    val tToks = array_distinct(filter(split(normT, " "), t => t =!= ""))
    val hit = size(filter(tToks, t => instr(normA, t) > 0))
    when(instr(normA, normT) > 0, 5)
      .when(hit * 2 >= size(tToks), 3)
      .otherwise(1)
  }

  /** Sentence-level BLEU-2 (Papineni et al., ACL 2002) between a
    * reference and a candidate token array — the generation-eval metric a
    * training-data pipeline runs over model outputs. Distributed shape:
    * explode n-grams (map-only), hash-aggregate per (doc, gram) with
    * map-side combine, clip with a per-gram least(), and sum back per doc
    * — two bounded shuffles over the gram space, no per-row O(L²) HOF
    * loop, no UDF.
    *
    * Determinism: clipped numerators and denominators are exact integers
    * (emitted for the strong check); the score itself composes ln/exp on
    * exact p_n rationals and is 6-dp-rounded at the end, so the ≤1-ulp
    * libm drift between engines is orders of magnitude below the
    * boundary. Returns (idCol, p1_num, p1_den, p2_num, p2_den, bleu). */
  def bleu2(docs: DataFrame, idCol: String, refCol: String, candCol: String): DataFrame = {
    def bigrams(toks: org.apache.spark.sql.Column) =
      when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    val base = docs.select(col(idCol), col(refCol).as("_ref"), col(candCol).as("_cand"))
    def clipped(n: Int): DataFrame = {
      val gram = (c: org.apache.spark.sql.Column) => if (n == 1) c else bigrams(c)
      val cg = base.select(col(idCol), explode(gram(col("_cand"))).as("g"))
        .groupBy(idCol, "g").agg(count(lit(1)).as("c_cnt"))
      val rg = base.select(col(idCol), explode(gram(col("_ref"))).as("g"))
        .groupBy(idCol, "g").agg(count(lit(1)).as("r_cnt"))
      cg.join(rg, Seq(idCol, "g"), "left")
        .groupBy(idCol)
        .agg(sum(least(col("c_cnt"), coalesce(col("r_cnt"), lit(0L)))).as(s"p${n}_num"))
    }
    val lens = base.select(col(idCol),
      size(col("_ref")).cast("long").as("r_len"), size(col("_cand")).cast("long").as("c_len"))
    val out = lens
      .join(clipped(1), Seq(idCol), "left")
      .join(clipped(2), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("p1_num"), lit(0L)).as("p1_num"), col("c_len").as("p1_den"),
        coalesce(col("p2_num"), lit(0L)).as("p2_num"),
        greatest(col("c_len") - 1, lit(0L)).as("p2_den"), col("r_len"), col("c_len"))
    val p1 = col("p1_num").cast("double") / col("p1_den").cast("double")
    val p2 = col("p2_num").cast("double") / col("p2_den").cast("double")
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double") / col("c_len").cast("double")))
    out.withColumn("bleu",
      when(col("p1_num") === 0 || col("p2_num") === 0 || col("p2_den") === 0, lit(0.0))
        .otherwise(round(bp * exp(lit(0.5) * log(p1) + lit(0.5) * log(p2)), 6)))
      .drop("r_len", "c_len")
  }

  /** ROUGE-L (Lin, 2004): LCS-based recall/precision/F1 between reference
    * and candidate token arrays — BLEU's order-robust sibling (a candidate
    * that keeps the reference's subsequence order scores even where exact
    * n-grams break). The LCS DP runs as the native codegen'd `lcs_len`
    * expression (`graft.functions.LcsLenExpr` — compiled O(r·c) two-row
    * DP; the equivalent nested-HOF fold measured 40 s at sf0.1 versus
    * sub-second compiled, so the HOF shape lives only in the DuckDB
    * oracle). Map-only, no shuffle at all. LCS and lengths are exact
    * integers (emitted for the strong check); F1 is pure arithmetic on
    * them (no transcendentals), 6-dp-rounded. */
  def rougeL(docs: DataFrame, idCol: String, refCol: String, candCol: String): DataFrame = {
    val ref = col(refCol); val cand = col(candCol)
    graft.functions.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    val lcs = call_function("lcs_len", ref, cand)
    val out = docs.select(col(idCol), lcs.cast("long").as("lcs_len"),
      size(ref).cast("long").as("r_len"), size(cand).cast("long").as("c_len"))
    val p = col("lcs_len").cast("double") / col("c_len").cast("double")
    val r = col("lcs_len").cast("double") / col("r_len").cast("double")
    out.withColumn("rouge_f1",
      when(col("lcs_len") === 0, lit(0.0))
        .otherwise(round(lit(2.0) * p * r / (p + r), 6)))
  }

  /** Run a golden set: (question, truth, level) + an answer fn (the ask
    * pipeline) → judged frame with per-level rollup + banding. */
  def run(questions: DataFrame, answer: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val answered = answer(questions)
    val judged = answered.withColumn("score", judgeScore(col("answer"), col("truth")))
    // avg kept unrounded: sum-of-ints / count is the same IEEE double in
    // any engine, while round() at a band boundary is not
    val summary = judged.groupBy(col("level"))
      .agg(avg(col("score")).as("avg_score"), count(lit(1)).as("n"))
      .withColumn("grade",
        when(col("avg_score") >= 4, "Excellent")
          .when(col("avg_score") >= 3.5, "Good")
          .when(col("avg_score") >= 2.5, "Fair")
          .otherwise("Poor"))
      .orderBy("level")
    (judged, summary)
  }
}
