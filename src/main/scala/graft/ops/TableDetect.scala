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

  /** LATTICE table detection — the Camelot "lattice" flavor analog (ref
    * `ingestion/table_extractor.py:566-700` tries lattice — DRAWN grid
    * lines — before stream): detect ruled grids from the painted path
    * segments [[Pdf.extractSegments]] recovers, then place text blocks
    * into the ruled cells.
    *
    *  1. RULES — near-axis-aligned segments at least `minLen` long;
    *     horizontal rules cluster on y within `posTol` (a hairline filled
    *     rectangle's two long edges collapse into one rule), vertical
    *     rules on x. Short decorative strokes fall out at `minLen` (the
    *     Camelot line_scale discipline).
    *  2. TABLES — horizontal rules group top-down; a vertical gap over
    *     `maxRowGap` starts a new table. A table needs ≥ `minRows`+1
    *     horizontal and ≥ `minCols`+1 assigned vertical rules (a vertical
    *     rule belongs to a table when its extent spans the table's
    *     vertical center and it lies within the table's x-extent).
    *  3. CELLS — consecutive rule pairs bound open intervals; a text
    *     block lands in the cell strictly containing its origin.
    *
    * Output shape is identical to [[detectTables]] (doc, table_idx,
    * row_idx, col_idx, cell_text), so the J1 lattice-beats-stream
    * priority composes with plain anti-joins (ref
    * `table_extractor.py:785-801`).
    *
    * Scale shape: ONE doc-key aggregate collects each page's rules (a
    * page holds at most a few dozen — the per-page bound is structural),
    * the grid solve is a map-only per-doc pass ([[latticeGrid]], pure and
    * spec-testable), and text placement is one more doc-key equi-join
    * with range residuals. Two doc shuffles total — a window-cascade
    * formulation of the same algebra measured 6× slower from per-stage
    * scheduling alone. */
  def detectLattice(segs: DataFrame, blocks: DataFrame, docCol: String = "doc_id",
                    posTol: Double = 2.0, minLen: Double = 10.0,
                    maxRowGap: Double = 60.0,
                    minCols: Int = 2, minRows: Int = 2): DataFrame = {
    import org.apache.spark.sql.types._
    val doc = col(docCol)
    val tagged = segs.select(doc,
      when(abs(col("y1") - col("y0")) <= posTol && abs(col("x1") - col("x0")) >= minLen,
        struct(((col("y0") + col("y1")) / 2).as("pos"),
          least(col("x0"), col("x1")).as("lo"), greatest(col("x0"), col("x1")).as("hi"))).as("h"),
      when(abs(col("x1") - col("x0")) <= posTol && abs(col("y1") - col("y0")) >= minLen,
        struct(((col("x0") + col("x1")) / 2).as("pos"),
          least(col("y0"), col("y1")).as("lo"), greatest(col("y0"), col("y1")).as("hi"))).as("v"))
    // collect_list drops the nulls, so one aggregate splits the rules
    val perDoc = tagged.groupBy(doc).agg(
      collect_list(col("h")).as("hs"), collect_list(col("v")).as("vs"))
    val cellType = StructType(Seq(
      StructField("table_idx", IntegerType), StructField("row_idx", IntegerType),
      StructField("col_idx", IntegerType),
      StructField("cx_lo", DoubleType), StructField("cx_hi", DoubleType),
      StructField("cy_lo", DoubleType), StructField("cy_hi", DoubleType)))
    val withCells = Stages.appendFields(perDoc,
        Seq(StructField("cells", ArrayType(cellType)))) { r =>
      def rules(name: String) = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](name)
        .map(s => (s.getDouble(0), s.getDouble(1), s.getDouble(2))).toSeq
      Seq(latticeGrid(rules("hs"), rules("vs"), posTol, maxRowGap, minCols, minRows)
        .map(c => org.apache.spark.sql.Row(c._1, c._2, c._3, c._4, c._5, c._6, c._7)))
    }
    val cells = withCells.select(doc, explode(col("cells")).as("c"))
      .select(doc, col("c.table_idx").as("table_idx"), col("c.row_idx").as("row_idx"),
        col("c.col_idx").as("col_idx"), col("c.cx_lo").as("cx_lo"),
        col("c.cx_hi").as("cx_hi"), col("c.cy_lo").as("cy_lo"), col("c.cy_hi").as("cy_hi"))
    blocks.join(cells, Seq(docCol))
      .filter(col("x") > col("cx_lo") && col("x") < col("cx_hi") &&
        col("y") > col("cy_lo") && col("y") < col("cy_hi"))
      .groupBy(doc, col("table_idx"), col("row_idx"), col("col_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("x"), col("text")))),
        t => t.getField("text")), " ").as("cell_text"))
  }

  /** The per-page ruled-grid solve — pure, bounded by rules-per-page:
    * cluster rule positions (chain within `posTol`; a hairline rect's two
    * edges collapse, representative = member mean), group horizontal
    * rules into tables (gap > `maxRowGap` splits), assign vertical rules
    * (extent spans the table's vertical center, position inside its
    * x-extent ± tol), then consecutive rule pairs bound the open cell
    * intervals. Returns (table_idx, row_idx, col_idx, cx_lo, cx_hi,
    * cy_lo, cy_hi), tables ordered top-down. */
  private[graft] def latticeGrid(hs: Seq[(Double, Double, Double)],
                                 vs: Seq[(Double, Double, Double)],
                                 posTol: Double, maxRowGap: Double,
                                 minCols: Int, minRows: Int)
      : Seq[(Int, Int, Int, Double, Double, Double, Double)] = {
    import scala.collection.mutable.ArrayBuffer
    def cluster(rules: Seq[(Double, Double, Double)], descending: Boolean) = {
      val sorted = if (descending) rules.sortBy(-_._1) else rules.sortBy(_._1)
      val bands = ArrayBuffer[ArrayBuffer[(Double, Double, Double)]]()
      for (r <- sorted) {
        if (bands.nonEmpty && math.abs(bands.last.last._1 - r._1) <= posTol) bands.last += r
        else bands += ArrayBuffer(r)
      }
      bands.map(b => (b.map(_._1).sum / b.size, b.map(_._2).min, b.map(_._3).max)).toSeq
    }
    val hb = cluster(hs, descending = true)  // top-down
    val vb = cluster(vs, descending = false) // left-to-right
    val groups = ArrayBuffer[ArrayBuffer[(Double, Double, Double)]]()
    for (r <- hb) {
      if (groups.nonEmpty && groups.last.last._1 - r._1 <= maxRowGap) groups.last += r
      else groups += ArrayBuffer(r)
    }
    val tables = groups.filter(_.size >= minRows + 1).map { g =>
      val yMid = (g.head._1 + g.last._1) / 2
      val xLo = g.map(_._2).min; val xHi = g.map(_._3).max
      val vA = vb.filter(v => v._2 <= yMid && v._3 >= yMid &&
        v._1 >= xLo - posTol && v._1 <= xHi + posTol)
      (g, vA)
    }.filter(_._2.size >= minCols + 1)
    tables.sortBy(-_._1.head._1).zipWithIndex.flatMap { case ((g, vA), ti) =>
      for {
        i <- 0 until g.size - 1
        j <- 0 until vA.size - 1
      } yield (ti, i, j, vA(j)._1, vA(j + 1)._1, g(i + 1)._1, g(i)._1)
    }.toSeq
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
