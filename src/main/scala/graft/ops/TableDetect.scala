package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-region detection from page GEOMETRY — the engine-side analog of
  * the reference's Camelot "stream" flavor (ref
  * `ingestion/table_extractor.py:703-757` consumes Camelot's
  * row/column-aligned cell grid; Camelot stream itself infers that grid
  * from text alignment, which is exactly what this operator does over the
  * (text, x, y) blocks [[Pdf.extractBlocks]] recovers):
  *
  *  1. ROW BANDS — distinct baselines per doc, top-down; a new band when
  *     the vertical gap exceeds `yTol` (gaps-and-islands over a lag, the
  *     w2 sessionize shape).
  *  2. COLUMN BANDS — distinct x origins per doc, left-to-right, split at
  *     gaps over `xTol`: text aligned within `xTol` shares an anchor.
  *  3. TABLE REGIONS — a row band qualifies when its blocks cover at
  *     least `minCols` column bands (prose lines cover one); a maximal
  *     run of consecutive qualifying bands with at least `minRows` rows
  *     is a table.
  *  4. CELLS — (row band, column band) with blocks joined left-to-right;
  *     `row_idx` top-down within the table, `col_idx` by band anchor x.
  *
  * Output: (doc, table_idx, row_idx, col_idx, cell_text) — the
  * columns-and-rows grid the reference's TableBlock carries, ready for
  * the existing J1/J2/P-family table ops (pdf7 composes them).
  *
  * Scale shape: every window and aggregate is partitioned by the doc
  * column — one shuffle on doc id, per-doc work bounded by blocks-per-
  * page; no cross-document state anywhere. At 100 TB this is a map-side
  * pipeline over however many executors hold pages. */
object TableDetect {

  def detectTables(blocks: DataFrame, docCol: String = "doc_id",
                   yTol: Double = 5.0, xTol: Double = 20.0,
                   minCols: Int = 2, minRows: Int = 2): DataFrame = {
    val doc = col(docCol)
    // 1. row bands over DISTINCT baselines (ties collapse before the lag)
    val wY = Window.partitionBy(doc).orderBy(col("y").desc)
    val rowBands = blocks.select(doc, col("y")).distinct()
      .withColumn("brk",
        when(lag(col("y"), 1).over(wY) - col("y") > yTol, 1).otherwise(0))
      .withColumn("row_band", sum(col("brk")).over(
        wY.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("brk")
    // 2. column bands over DISTINCT x origins
    val wX = Window.partitionBy(doc).orderBy(col("x"))
    val colBands = blocks.select(doc, col("x")).distinct()
      .withColumn("brk",
        when(col("x") - lag(col("x"), 1).over(wX) > xTol, 1).otherwise(0))
      .withColumn("col_band", sum(col("brk")).over(
        wX.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("brk")
    val anchors = colBands.groupBy(doc, col("col_band")).agg(min(col("x")).as("col_x"))
    val banded = blocks
      .join(rowBands, Seq(docCol, "y"))
      .join(colBands, Seq(docCol, "x"))
    // 3. qualifying rows → islands of consecutive bands → tables
    val qual = banded.groupBy(doc, col("row_band"))
      .agg(countDistinct(col("col_band")).as("n_cols"))
      .filter(col("n_cols") >= minCols)
      .withColumn("isl", col("row_band") -
        row_number().over(Window.partitionBy(doc).orderBy(col("row_band"))))
    val tables = qual.groupBy(doc, col("isl"))
      .agg(count(lit(1)).as("n_rows"), min(col("row_band")).as("top_band"))
      .filter(col("n_rows") >= minRows)
      .withColumn("table_idx",
        (row_number().over(Window.partitionBy(doc).orderBy(col("top_band"))) - 1).cast("int"))
    // 4. cells: qualifying bands inside an island are consecutive integers
    // (the gaps-and-islands invariant), so row_idx = row_band − top_band
    // without another window
    val cells = banded
      .join(qual.select(doc, col("row_band"), col("isl")), Seq(docCol, "row_band"))
      .join(tables.select(doc, col("isl"), col("table_idx"), col("top_band")), Seq(docCol, "isl"))
      .join(anchors, Seq(docCol, "col_band"))
      .withColumn("col_idx",
        (dense_rank().over(Window.partitionBy(doc, col("table_idx"))
          .orderBy(col("col_x"))) - 1).cast("int"))
    cells.groupBy(doc, col("table_idx"),
        (col("row_band") - col("top_band")).cast("int").as("row_idx"), col("col_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("x"), col("text")))),
        t => t.getField("text")), " ").as("cell_text"))
  }

  /** Detected tables → one text row per table row, cells joined in
    * column order — the record shape the J-family dedup/anti-join ops
    * consume (the reference's `_compute_row_content_hash` operates on
    * exactly this row-content view, `table_extractor.py:238-247`). */
  def tableRows(cells: DataFrame, docCol: String = "doc_id",
                sep: String = " | "): DataFrame =
    cells.groupBy(col(docCol), col("table_idx"), col("row_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("col_idx"), col("cell_text")))),
        t => t.getField("cell_text")), sep).as("row_text"))
}
