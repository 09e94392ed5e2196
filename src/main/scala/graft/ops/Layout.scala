package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layout / order-dependent operators (SURVEY.md §2.5 W1, §2.4 A1, §2.8 F1/F2).
  *
  *  - W1 reading order: ref `ingestion/pdf_parser.py:173-179` — row-major sort
  *    with a vertical tolerance bucket, 2-column aware.
  *  - A1 page font median: ref `ingestion/pdf_parser.py:297-305`.
  *  - F2 heading detect: ref `ingestion/pdf_parser.py:335-343`.
  *
  * All window stages require a total order `(partition, ord)`; `readingOrder`
  * materializes that ordinal once so downstream stages never re-sort.
  */
object Layout {

  /** W1: assign a reading-order ordinal within each partition.
    * `bucket` is the coarse row key (e.g. `floor(y0/12)`), `fine` the
    * horizontal tiebreak, `stable` a unique id for determinism. */
  def readingOrder(df: DataFrame, partCols: Seq[Column], bucket: Column, fine: Column, stable: Column,
                   ordName: String = "ord"): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(bucket, fine, stable)
    df.withColumn(ordName, row_number().over(w))
  }

  /** A1: per-partition median (exact) as an analytic column — the ref's
    * per-page font-size median used as the heading threshold. */
  def partitionMedian(df: DataFrame, partCols: Seq[Column], value: Column, out: String): DataFrame =
    df.withColumn(out, percentile(value, lit(0.5)).over(Window.partitionBy(partCols: _*)))

  /** F2: heading flag — value exceeds `ratio` × partition median and content
    * is short and not numeric-only. */
  def isHeading(value: Column, median: Column, content: Column, ratio: Double = 1.2): Column =
    (value > median * ratio) && (length(content) < 200) && !content.rlike("^[\\d\\s.,%-]+$")

  /** F1: block-type detect — warning/note/step classification by leading
    * keyword. Ref `ingestion/pdf_parser.py:113-122`. */
  def blockType(content: Column): Column = {
    val up = upper(trim(content))
    when(up.rlike("^(WARNING|CAUTION|DANGER|คำเตือน|ข้อควรระวัง)[:\\s]"), "warning")
      .when(up.rlike("^(NOTE|NOTICE|REMARK|หมายเหตุ)[:\\s]"), "note")
      .when(up.rlike("^(STEP\\s*\\d+|\\d+[.)]\\s|ขั้นตอนที่)"), "step")
      .otherwise("paragraph")
  }
}
