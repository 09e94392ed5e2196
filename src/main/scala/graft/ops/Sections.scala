package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Section propagation and rule-based classification
  * (SURVEY.md §2.5 W3, §2.8 F4/F16/F17/F18).
  *
  *  - W3 forward fill: ref `ingestion/pdf_parser.py:348-351,419-434` — a
  *    heading sets the active section, carried across subsequent blocks.
  *  - F16 doc classifier: ref `ingestion/document_classifier.py:87-183` —
  *    keyword cascade over name + sampled content.
  *  - F18 query intent: ref `backend/services/rag.py:205-227`.
  */
object Sections {

  /** W3: forward-fill `value` (null on non-setter rows) across the ordered
    * partition — `last(..., ignoreNulls)` over an unbounded-preceding frame. */
  def forwardFill(df: DataFrame, partCols: Seq[Column], orderCol: Column, value: Column,
                  out: String): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(value, ignoreNulls = true).over(w))
  }

  /** F17: partition-level flag broadcast — true for all rows of a partition
    * when any row satisfies `cond` (ref forces doc_type=qna when any block
    * matches the Q&A pattern). */
  def anyInPartition(df: DataFrame, partCols: Seq[Column], cond: Column, out: String): DataFrame =
    df.withColumn(out, max(cond.cast("int")).over(Window.partitionBy(partCols: _*)) === 1)

  /** F16: rule-based document classifier — first-match keyword cascade over
    * lowercase text. `rules` is an ordered (label, regex) list; falls back to
    * `default`. */
  def classify(content: Column, rules: Seq[(String, String)], default: String): Column = {
    val lc = lower(content)
    rules.foldRight(lit(default): Column) { case ((label, pattern), rest) =>
      when(lc.rlike(pattern), label).otherwise(rest)
    }
  }

  /** F4/A7: score intents — for each (intent, pattern) count regex keyword
    * hits; returns array<struct<score,intent>> sorted score-desc (intent asc
    * as tiebreak), capped at `cap`. Pure expressions, no UDF. */
  def intentScores(content: Column, intents: Seq[(String, String)], cap: Int = 5): Column = {
    val lc = lower(content)
    val scored = intents.map { case (name, pattern) =>
      struct(size(regexp_extract_all(lc, lit(pattern), lit(0))).as("score"), lit(name).as("intent"))
    }
    val arr = filter(array(scored: _*), s => s.getField("score") > 0)
    // sort by (-score, intent): negate score so ascending sort gives score-desc
    val keyed = transform(arr, s => struct((-s.getField("score")).as("negscore"), s.getField("intent").as("intent")))
    slice(transform(sort_array(keyed), s => struct((-s.getField("negscore")).as("score"), s.getField("intent").as("intent"))), 1, cap)
  }

  /** Primary intent = highest score (name asc as tiebreak), null when none. */
  def primaryIntent(scores: Column): Column =
    get(scores, lit(0)).getField("intent")
}
