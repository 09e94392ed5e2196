package graft

import org.apache.spark.sql.functions._
import graft.eval.Validator

case class ValidatorSpecBlk(doc_id: Long, block_id: String, block_type: String,
                            page: Option[Int], content: String, bbox: Seq[Double],
                            section: String, role: String, category: String,
                            columns: Seq[String], rows: Seq[Seq[String]], image_path: String)
case class ValidatorSpecMeta(doc_id: Long, file_name: String, page_count: Option[Int])

/** One violating fixture per block-model issue code: every code in
  * `validateBlocks` must fire on its planted row and stay quiet on the
  * clean rows.
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val bbox4 = Seq(0.0, 0.0, 5.0, 5.0)
  private type Blk = ValidatorSpecBlk
  private val Blk = ValidatorSpecBlk
  private type Meta = ValidatorSpecMeta
  private val Meta = ValidatorSpecMeta

  private def txt(doc: Long, id: String, page: Int = 1, content: String = "good content",
                  bbox: Seq[Double] = bbox4, section: String = "s", role: String = "r") =
    Blk(doc, id, "text", Some(page), content, bbox, section, role, null, null, null, null)
  private def tbl(doc: Long, id: String, page: Int = 1, bbox: Seq[Double] = bbox4,
                  columns: Seq[String] = Seq("a", "b"), rows: Seq[Seq[String]] = Seq(Seq("1", "2")),
                  category: String = "c", role: String = "transaction_table") =
    Blk(doc, id, "table", Some(page), null, bbox, null, role, category, columns, rows, null)
  private def img(doc: Long, id: String, page: Int = 1, path: String = "/img/x") =
    Blk(doc, id, "image", Some(page), null, null, null, null, null, null, null, path)

  test("every block-model issue code fires on its planted fixture") {
    val blocks = Seq(
      txt(1, "t-ok"),
      txt(2, "t-dup"), txt(2, "t-dup"),                     // DUPLICATE_TEXT_ID
      txt(3, "t-badpage", page = -1),                       // TEXT_PAGE_INVALID
      txt(4, "t-pastend", page = 99),                       // TEXT_PAGE_OUT_OF_RANGE + PAGE_COUNT_MISMATCH
      txt(5, "t-long", content = "x" * 9000),               // TEXT_BLOCK_VERY_LONG
      txt(6, "t-short", content = " "),                     // TEXT_BLOCK_VERY_SHORT
      txt(7, "t-bbox3", bbox = Seq(0.0, 0.0, 5.0)),         // TEXT_BBOX_INVALID
      txt(8, "t-bboxneg", bbox = Seq(-1.0, 0.0, 5.0, 5.0)), // BBOX_OUT_OF_PAGE
      txt(9, "t-nosec", section = null),                    // TEXT_NO_SECTION
      txt(10, "t-norole", role = null),                     // TEXT_NO_ROLE
      tbl(11, "tb-dup"), tbl(11, "tb-dup"),                 // DUPLICATE_TABLE_ID
      tbl(12, "tb-badpage", page = 0),                      // TABLE_PAGE_INVALID
      tbl(13, "tb-pastend", page = 99),                     // TABLE_PAGE_OUT_OF_RANGE
      tbl(14, "tb-nohdr", columns = Seq()),                 // TABLE_NO_HEADER (+ ROW_LEN_MISMATCH)
      tbl(15, "tb-norows", rows = Seq()),                   // TABLE_NO_ROWS
      tbl(16, "tb-ragged", rows = Seq(Seq("1"))),           // ROW_LEN_MISMATCH
      tbl(17, "tb-bbox", bbox = Seq(1.0)),                  // TABLE_BBOX_INVALID
      tbl(18, "tb-nocat", category = null),                 // TABLE_NO_CATEGORY
      tbl(27, "tb-norole", role = null),                    // TABLE_NO_ROLE
      img(19, "im-dup"), img(19, "im-dup"),                 // DUPLICATE_IMAGE_ID
      img(20, "im-nopath", path = null),                    // IMAGE_NO_PATH
      img(21, "im-badpage", page = -2),                     // IMAGE_PAGE_INVALID
      img(22, "im-pastend", page = 99)                      // IMAGE_PAGE_OUT_OF_RANGE
    ).toDF()
    val meta = (Seq(
      Meta(23, "", Some(10)),                               // MISSING_FILE_NAME
      Meta(24, "f.pdf", Some(0)),                           // INVALID_PAGE_COUNT
      Meta(25, "f.pdf", None),                              // MISSING_PAGE_COUNT (block 25 has a page)
      Meta(26, "f.pdf", Some(10)),                          // NO_TEXT_BLOCKS (no blocks at all)
      Meta(27, "27.pdf", Some(10))
    ) ++ (1L to 22L).map(i => Meta(i, s"$i.pdf", Some(10)))).toDF()
    val allBlocks = blocks.unionByName(Seq(txt(25, "t-paged")).toDF())

    val got = Validator.validateBlocks(allBlocks, meta)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

    val expected = Map(
      "MISSING_DOC_ID" -> 0L, "MISSING_FILE_NAME" -> 1L, "INVALID_PAGE_COUNT" -> 1L,
      "PAGE_COUNT_MISMATCH" -> 3L, // docs 4, 13, 22 (page 99 > 10)
      "MISSING_PAGE_COUNT" -> 1L,
      "NO_TEXT_BLOCKS" -> 16L, // 11-22, 27 (table/image-only) + blockless 23, 24, 26
      "DUPLICATE_TEXT_ID" -> 1L, "DUPLICATE_TABLE_ID" -> 1L, "DUPLICATE_IMAGE_ID" -> 1L,
      "TEXT_PAGE_INVALID" -> 1L, "TEXT_PAGE_OUT_OF_RANGE" -> 1L,
      "TEXT_BLOCK_VERY_LONG" -> 1L, "TEXT_BLOCK_VERY_SHORT" -> 1L,
      "TEXT_BBOX_INVALID" -> 1L, "BBOX_OUT_OF_PAGE" -> 1L,
      "TEXT_NO_SECTION" -> 1L, "TEXT_NO_ROLE" -> 1L,
      "TABLE_PAGE_INVALID" -> 1L, "TABLE_PAGE_OUT_OF_RANGE" -> 1L,
      "TABLE_NO_HEADER" -> 1L, "TABLE_NO_ROWS" -> 1L, "ROW_LEN_MISMATCH" -> 2L,
      "TABLE_BBOX_INVALID" -> 1L, "TABLE_NO_CATEGORY" -> 1L, "TABLE_NO_ROLE" -> 1L,
      "IMAGE_NO_PATH" -> 1L, "IMAGE_PAGE_INVALID" -> 1L, "IMAGE_PAGE_OUT_OF_RANGE" -> 1L)
    expected.foreach { case (code, n) =>
      assert(got.get(code).contains(n), s"$code: expected $n got ${got.get(code)}")
    }
    assert(got.size == expected.size, s"unexpected codes: ${got.keySet -- expected.keySet}")
  }
}
