package graft

import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("P1 normalizeText strips control chars, collapses space, caps blank lines; idempotent") {
    val raw = "a b\u200B  c\t d \n\n\n\n e f"
    val df = Seq(raw).toDF("t").select(Cleaning.normalizeText(col("t")).as("n"))
    val once = df.collect()(0).getString(0)
    assert(once == "a b c d\n\ne f")
    val twice = Seq(once).toDF("t").select(Cleaning.normalizeText(col("t")).as("n")).collect()(0).getString(0)
    assert(twice == once, "normalization must be idempotent")
  }

  test("P2 isNoise flags page numbers and punct-only blocks") {
    val df = Seq("- 12 -", "***", "k", "real content here").toDF("t")
      .select(col("t"), Cleaning.isNoise(col("t")).as("noise"))
    val m = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(m("- 12 -") && m("***") && m("k") && !m("real content here"))
  }

  test("F10 parseMoney handles commas, currency, accounting negatives") {
    val df = Seq("$1,234.56", "(789.10)", "฿55 บาท", "12.5", "junk").toDF("t")
      .select(Cleaning.parseMoney(col("t")).as("v"))
    val vs = df.collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(vs(0).contains(1234.56) && vs(1).contains(-789.10) && vs(2).contains(55.0) && vs(3).contains(12.5) && vs(4).isEmpty)
  }

  test("P3 dehyphenateThai joins Thai across line breaks, keeps Latin breaks") {
    val out = Seq("กา\nรา and eng\nlish ......").toDF("t")
      .select(Cleaning.dehyphenateThai(col("t")).as("n")).collect()(0).getString(0)
    assert(out == "การา and eng lish")
  }

  test("P5 cleanRows pads ragged rows to max width and drops empty rows") {
    val df = Seq(
      (1, Seq(Seq(" a ", "b"), Seq("c"), Seq("", " ")))
    ).toDF("id", "rows").select(TableOps.cleanRows(col("rows")).as("r"))
    val r = df.collect()(0).getSeq[Seq[String]](0)
    assert(r == Seq(Seq("a", "b"), Seq("c", "")))
  }

  test("W4 chunkIdExact resets budget at breaks; approx differs only on reset semantics") {
    val rows = Seq(
      ("d1", 1L, 500L, false), ("d1", 2L, 500L, false), ("d1", 3L, 500L, false),
      ("d1", 4L, 100L, true), ("d1", 5L, 1300L, false))
    val df = rows.toDF("k", "ord", "len", "brk")
    val exact = Chunking.chunkIdExact(df, "k", "ord", "len", "brk", 1200)
      .orderBy("ord").collect().map(_.getLong(2)).toSeq
    // 500, 500(=1000), 500(overflow→1), 100(brk→2), 1300(overflow→3)
    assert(exact == Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("J1 preferPrimary keeps secondary rows only for missing keys") {
    val p = Seq((1, "p"), (2, "p")).toDF("k", "src")
    val s = Seq((2, "s"), (3, "s")).toDF("k", "src")
    val out = TableOps.preferPrimary(p, s, Seq("k")).orderBy("k", "src")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "p"), (2, "p"), (3, "s")))
  }

  test("F11 canonicalizeHeader first-match-wins with default") {
    val out = Seq("Total Amount (THB)", "วันที่ date", "whatever").toDF("h")
      .select(TableOps.canonicalizeHeader(col("h"), Seq("amount" -> "amount", "date" -> "date")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("amount", "date", "other"))
  }

  test("TextAnalysis languageId picks profile with most marker hits") {
    val profiles = Seq("en" -> Seq("the", "and", "of"), "de" -> Seq("der", "und", "das"))
    val out = Seq("the cat and the dog", "der hund und das haus", "xyz").toDF("t")
      .select(TextAnalysis.languageId(col("t"), profiles).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "de", "und"))
  }

  test("repetitionStats computes dup fraction, top bigram, longest run") {
    val df = Seq(
      (1L, "a b a b a b"),        // toks 6, distinct 2; bigram "a b" 3 of 5; runs all len 1
      (2L, "x x x y z")           // toks 5, distinct 3; top bigram "x x" 2 of 4; run of x = 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 6 && math.abs(out(0).getDouble(2) - 4.0 / 6) < 1e-12)
    assert(math.abs(out(0).getDouble(3) - 3.0 / 5) < 1e-12 && out(0).getLong(4) == 1)
    assert(out(1).getLong(1) == 5 && math.abs(out(1).getDouble(2) - 2.0 / 5) < 1e-12)
    assert(math.abs(out(1).getDouble(3) - 2.0 / 4) < 1e-12 && out(1).getLong(4) == 3)
  }

  test("hash sampling is deterministic and tracks the rate") {
    val df = spark.range(10000).toDF("id")
    val kept = df.filter(TextAnalysis.hashSamplePredicate(col("id"), 0.25)).count()
    assert(math.abs(kept / 10000.0 - 0.25) < 0.02, s"kept $kept of 10000 at rate 0.25")
    val again = df.filter(TextAnalysis.hashSamplePredicate(col("id"), 0.25)).count()
    assert(kept == again, "same keys must sample identically on rerun")
    assert(df.filter(TextAnalysis.hashSamplePredicate(col("id"), 1.0)).count() == 10000)
    assert(df.filter(TextAnalysis.hashSamplePredicate(col("id"), 0.0)).count() == 0)
  }

  test("parseHtmlTable: plain table, nested tags, entities, whitespace") {
    val html = """<table>
      <thead><tr><th> Item &amp; Co </th><th>Price</th></tr></thead>
      <tbody><tr><td><b>apple  pie</b></td><td> 1.50 </td></tr>
             <tr><td>bread&nbsp;loaf</td><td>2.00</td></tr></tbody></table>"""
    val r = parsed(html)
    assert(r.cols == Seq("Item & Co", "Price"))
    assert(r.rows == Seq(Seq("apple pie", "1.50"), Seq("bread loaf", "2.00")))
    assert(!r.complexBody && !r.complexHeader)
  }

  test("parseHtmlTable: ragged rows pad, long rows truncate to header width") {
    val html = "<table><tr><th>a</th><th>b</th></tr>" +
      "<tr><td>1</td></tr><tr><td>2</td><td>3</td><td>4</td></tr></table>"
    val r = parsed(html)
    assert(r.rows == Seq(Seq("1", ""), Seq("2", "3")))
  }

  test("parseHtmlTable: body colspan forces empty output with complex_body") {
    // the span sits in the SECOND body row — the first is header territory
    val html = "<table><tr><th>a</th><th>b</th></tr>" +
      "<tr><td>x</td><td>y</td></tr><tr><td colspan=\"2\">merged</td></tr></table>"
    val r = parsed(html)
    assert(r.cols.isEmpty && r.rows.isEmpty && r.complexBody)
  }

  test("parseHtmlTable: first-body-row spans are header territory (ref fidelity)") {
    // ref table_extractor.py: is_header_row = (not self.rows) holds while
    // the first body row's cells are processed — a colspan there is
    // extracted flat with no flag, a rowspan there flags the HEADER
    val colspan1 = parsed("<table><tr><th>a</th><th>b</th></tr>" +
      "<tr><td colspan=\"2\">merged</td></tr><tr><td>x</td><td>y</td></tr></table>")
    assert(colspan1.cols == Seq("a", "b"))
    assert(colspan1.rows == Seq(Seq("merged", ""), Seq("x", "y")))
    assert(!colspan1.complexBody && !colspan1.complexHeader)
    val rowspan1 = parsed("<table><tr><th>a</th><th>b</th></tr>" +
      "<tr><td rowspan=\"2\">x</td><td>y</td></tr></table>")
    assert(rowspan1.rows == Seq(Seq("x", "y")))
    assert(rowspan1.complexHeader && !rowspan1.complexBody)
  }

  test("parseHtmlTable: header rowspan flags complex_header but keeps data") {
    val html = "<table><tr><th rowspan=\"2\">a</th><th>b</th></tr>" +
      "<tr><td>x</td><td>y</td></tr></table>"
    val r = parsed(html)
    assert(r.cols == Seq("a", "b") && r.rows == Seq(Seq("x", "y")))
    assert(r.complexHeader && !r.complexBody)
  }

  test("parseHtmlTable: header-only and cell-free tables are forced empty") {
    val headerOnly = parsed("<table><tr><th>a</th><th>b</th></tr></table>")
    assert(headerOnly.cols.isEmpty && headerOnly.rows.isEmpty && headerOnly.complexBody)
    val noCells = parsed("<p>no table here</p>")
    assert(noCells.cols.isEmpty && noCells.rows.isEmpty && !noCells.complexBody)
  }

  private case class ParsedTable(cols: Seq[String], rows: Seq[Seq[String]],
                                 complexBody: Boolean, complexHeader: Boolean)

  private def parsed(html: String): ParsedTable = {
    val row = Seq(html).toDF("h").select(TableOps.parseHtmlTable(col("h")).as("t"))
      .select("t.columns", "t.rows", "t.has_complex_body", "t.has_complex_header")
      .collect()(0)
    ParsedTable(row.getSeq[String](0), row.getSeq[Seq[String]](1), row.getBoolean(2), row.getBoolean(3))
  }
}
