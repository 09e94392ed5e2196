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
    // ONE gram pass for all four tables (cand/ref × uni/bi): tag each gram
    // with (n, side) and explode once — the previous per-table form
    // re-tokenized the corpus four times and shuffled four gram tables for
    // counts one exchange produces. Clipping is unchanged arithmetic:
    // Σ least(c_cnt, r_cnt) over the merged groups ≡ the cand-side left
    // join (ref-only groups have c_cnt = 0 and contribute least(0, r) = 0).
    // coalesce each side to an empty array BEFORE tagging: concat() of the
    // four tagged arrays returns NULL if any ONE input is null, which would
    // drop the non-null side's grams too (numerically masked today by
    // least(_, 0) = 0, but a fragile coupling for any future consumer of
    // c_cnt/r_cnt). A null side now drops only its own grams. Lengths
    // below stay on the RAW columns — size(null) semantics unchanged.
    def tagged(c: org.apache.spark.sql.Column, n: Int, side: Int) =
      transform(coalesce(c, array().cast("array<string>")),
        g => struct(lit(n).as("n"), g.as("g"), lit(side.toLong).as("cside")))
    val grams = base.select(col(idCol), explode(concat(
        tagged(col("_cand"), 1, 1), tagged(col("_ref"), 1, 0),
        tagged(bigrams(col("_cand")), 2, 1), tagged(bigrams(col("_ref")), 2, 0))).as("t"))
      .select(col(idCol), col("t.n").as("n"), col("t.g").as("g"), col("t.cside").as("cside"))
    val nums = grams.groupBy(idCol, "n", "g")
      .agg(sum(col("cside")).as("c_cnt"), sum(lit(1L) - col("cside")).as("r_cnt"))
      .groupBy(idCol)
      .agg(sum(when(col("n") === 1, least(col("c_cnt"), col("r_cnt"))).otherwise(0L)).as("p1_num"),
        sum(when(col("n") === 2, least(col("c_cnt"), col("r_cnt"))).otherwise(0L)).as("p2_num"))
    val lens = base.select(col(idCol),
      size(col("_ref")).cast("long").as("r_len"), size(col("_cand")).cast("long").as("c_len"))
    val out = lens
      .join(nums, Seq(idCol), "left")
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
