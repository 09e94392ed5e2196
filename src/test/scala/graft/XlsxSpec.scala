package graft

import graft.ops.Xlsx
import org.scalatest.funsuite.AnyFunSuite

/** XLSX cell extraction: A1 reference decode, shared-string resolution
  * (entities included), inline strings, numeric cells, bad-index
  * quarantine. The ZIP layer under it is differential-tested in
  * ZipSpec. */
class XlsxSpec extends AnyFunSuite {

  test("A1-style references decode to ordinals") {
    assert(Xlsx.parseRef("A1").contains((1, 1)))
    assert(Xlsx.parseRef("Z9").contains((9, 26)))
    assert(Xlsx.parseRef("AA10").contains((10, 27)))
    assert(Xlsx.parseRef("BC702").contains((702, 55)))
    assert(Xlsx.parseRef("").isEmpty && Xlsx.parseRef("A").isEmpty &&
      Xlsx.parseRef("7").isEmpty && Xlsx.parseRef("A0").isEmpty && Xlsx.parseRef("A1B").isEmpty)
  }

  test("round trip: shared, numeric, and entity-bearing cells") {
    val xlsx = Xlsx.encodeXlsx(Seq("plain", "fish & chips", "<tag>"),
      Seq("A1" -> Left(1), "B1" -> Right("42"), "A2" -> Left(2), "B2" -> Right("-3.5")))
    val es = graft.ops.Zip.listEntries(xlsx).get
    assert(es.map(_.name).contains("xl/sharedStrings.xml"))
    val sheet = new String(graft.ops.Zip.extract(xlsx,
      es.find(_.name == "xl/worksheets/sheet1.xml").get).get, "UTF-8")
    val shared = Xlsx.sharedStrings(new String(graft.ops.Zip.extract(xlsx,
      es.find(_.name == "xl/sharedStrings.xml").get).get, "UTF-8"))
    assert(shared == IndexedSeq("plain", "fish & chips", "<tag>"))
    val cells = Xlsx.sheetCells(sheet, shared)
    assert(cells.map(c => (c.ref, c.row, c.col, c.str, c.num)) == Seq(
      ("A1", 1, 1, "fish & chips", null), ("B1", 1, 2, null, "42"),
      ("A2", 2, 1, "<tag>", null), ("B2", 2, 2, null, "-3.5")))
  }

  test("inline strings, out-of-range shared indexes, empty cells") {
    val xml = """<worksheet><sheetData><row r="1">
      <c r="A1" t="s"><v>9</v></c>
      <c r="B1" t="inlineStr"><is><t>in &amp; line</t></is></c>
      <c r="C1"/>
      </row></sheetData></worksheet>"""
    val cells = Xlsx.sheetCells(xml, IndexedSeq("only"))
    assert(cells.map(c => (c.ref, c.str, c.num)) == Seq(
      ("A1", null, null),          // index 9 past the 1-entry table → quarantined value
      ("B1", "in & line", null),
      ("C1", null, null)))
  }
}
