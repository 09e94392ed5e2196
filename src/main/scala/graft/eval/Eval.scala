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
