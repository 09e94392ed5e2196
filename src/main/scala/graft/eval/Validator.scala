package graft.eval

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality assertion suite (SURVEY.md §5.2; ref `ingestion/validator.py`
  * issue codes re-expressed as distributed DataFrame checks — the ref's
  * per-doc validation.json as one report frame).
  *
  * Two check shapes:
  *  - per-row predicates ([[Check]]): ONE aggregate pass per input frame,
  *    every code a `sum(when(pred,1))` in the same aggregation;
  *  - aggregate-shaped checks (duplicates, referential integrity, per-doc
  *    rollups): individually lazy frames.
  * Everything is unioned lazily — materializing the report is the only
  * action, so the whole suite is a handful of jobs regardless of how many
  * codes it emits.
  *
  * Block model (ref `schema.py` IngestedDocument flattened): `blocks`
  * (doc_id, block_id, block_type ∈ text|table|image, page, content, bbox
  * array<double>, section, role, category, columns array<string>, rows
  * array<array<string>>, image_path) + `meta` (doc_id, file_name,
  * page_count). Fields irrelevant to a block's type may be null — every
  * predicate is guarded by its type test.
  */
object Validator {

  /** One issue code backed by a per-row violation predicate. */
  final case class Check(code: String, severity: String, violation: Column)

  /** All per-row checks in ONE aggregate pass → (code, severity, n_violations). */
  def checkFrame(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => sum(when(c.violation, 1L).otherwise(0L)).as(c.code))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map(c =>
        struct(lit(c.code).as("code"), lit(c.severity).as("severity"),
          coalesce(col(c.code), lit(0L)).as("n_violations"))): _*)).as("i"))
      .select("i.code", "i.severity", "i.n_violations")
  }

  private def issueCount(df: DataFrame, code: String, severity: String): DataFrame =
    df.agg(count(lit(1)).as("n_violations"))
      .select(lit(code).as("code"), lit(severity).as("severity"), col("n_violations"))

  /** DUPLICATE_*_ID: number of distinct duplicated key values (ref counts
    * the dup id list, not the extra rows). */
  def duplicateIdFrame(df: DataFrame, keys: Seq[String], code: String,
                       severity: String = "warning"): DataFrame =
    issueCount(df.groupBy(keys.map(col): _*).count().filter(col("count") > 1), code, severity)

  /** Referential integrity: distinct fk values absent from the dimension. */
  def brokenRefFrame(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
                     code: String, severity: String = "error"): DataFrame =
    issueCount(fact.select(col(fk)).distinct()
      .join(dim.select(col(pk)).distinct(), col(fk) === col(pk), "left_anti"), code, severity)

  /** The reference's validate_all over the block model. `longContent` is
    * the TEXT_BLOCK_VERY_LONG threshold (ref: 8000).
    *
    * Reference codes structurally N/A here: TEXT/TABLE/IMAGE_DOC_ID_MISMATCH
    * guard against a block whose embedded doc_id disagrees with its parent
    * document's — in this flattened block model doc_id IS the grouping key
    * the blocks are carried under, so the mismatch cannot be represented
    * (the ref stores blocks nested inside a document object with their own
    * id fields). MISSING_FILE is likewise N/A: it stats the source PDF on
    * local disk, a driver-side filesystem check with no distributed analog
    * over parquet-resident data (MISSING_FILE_NAME covers the metadata
    * half). */
  def validateBlocks(blocks: DataFrame, meta: DataFrame, longContent: Int = 8000): DataFrame = {
    val isText = col("block_type") === "text"
    val isTable = col("block_type") === "table"
    val isImage = col("block_type") === "image"
    val bboxInvalid = col("bbox").isNotNull && size(col("bbox")) =!= 4
    val bboxOutOfPage = col("bbox").isNotNull && size(col("bbox")) === 4 &&
      (exists(col("bbox"), x => x < 0) ||
        element_at(col("bbox"), 1) > element_at(col("bbox"), 3) ||
        element_at(col("bbox"), 2) > element_at(col("bbox"), 4))
    val withPc = blocks.join(
      broadcast(meta.select(col("doc_id"), col("page_count").as("_pc"))), Seq("doc_id"), "left")

    val rowChecks = checkFrame(withPc, Seq(
      Check("TEXT_PAGE_INVALID", "warning", isText && col("page") <= 0),
      Check("TEXT_PAGE_OUT_OF_RANGE", "warning", isText && col("page") > col("_pc")),
      Check("TEXT_BLOCK_VERY_LONG", "info", isText && length(col("content")) > longContent),
      Check("TEXT_BLOCK_VERY_SHORT", "info", isText && length(trim(col("content"))) < 2),
      Check("TEXT_BBOX_INVALID", "warning", isText && bboxInvalid),
      Check("BBOX_OUT_OF_PAGE", "warning", bboxOutOfPage),
      Check("TEXT_NO_SECTION", "info", isText && col("section").isNull),
      Check("TEXT_NO_ROLE", "info", isText && col("role").isNull),
      Check("TABLE_PAGE_INVALID", "warning", isTable && col("page") <= 0),
      Check("TABLE_PAGE_OUT_OF_RANGE", "warning", isTable && col("page") > col("_pc")),
      Check("TABLE_NO_HEADER", "warning", isTable && size(col("columns")) === 0 && size(col("rows")) > 0),
      Check("TABLE_NO_ROWS", "warning", isTable && size(col("columns")) > 0 && size(col("rows")) === 0),
      Check("ROW_LEN_MISMATCH", "warning",
        isTable && exists(col("rows"), r => size(r) =!= size(col("columns")))),
      Check("TABLE_BBOX_INVALID", "warning", isTable && bboxInvalid),
      Check("TABLE_NO_CATEGORY", "info", isTable && col("category").isNull),
      Check("TABLE_NO_ROLE", "info", isTable && col("role").isNull),
      Check("IMAGE_NO_PATH", "warning", isImage && (col("image_path").isNull || col("image_path") === "")),
      Check("IMAGE_PAGE_INVALID", "warning", isImage && col("page") <= 0),
      Check("IMAGE_PAGE_OUT_OF_RANGE", "warning", isImage && col("page") > col("_pc"))))

    val metaChecks = checkFrame(meta, Seq(
      Check("MISSING_DOC_ID", "error", col("doc_id").isNull || col("doc_id").cast("string") === ""),
      Check("MISSING_FILE_NAME", "warning", col("file_name").isNull || col("file_name") === ""),
      Check("INVALID_PAGE_COUNT", "warning", col("page_count").isNotNull && col("page_count") <= 0)))

    // per-doc rollup once, outer-joined to meta: PAGE_COUNT_MISMATCH,
    // MISSING_PAGE_COUNT and NO_TEXT_BLOCKS share a single aggregation pass
    val perDoc = meta.select(col("doc_id"), col("page_count"))
      .join(blocks.groupBy("doc_id").agg(
        max(col("page")).as("_maxp"),
        max(col("page").isNotNull).as("_haspage"),
        max(col("block_type") === "text").as("_hastext")), Seq("doc_id"), "left")
    val docChecks = checkFrame(perDoc, Seq(
      Check("PAGE_COUNT_MISMATCH", "warning", col("_maxp") > col("page_count")),
      Check("MISSING_PAGE_COUNT", "warning",
        col("page_count").isNull && coalesce(col("_haspage"), lit(false))),
      Check("NO_TEXT_BLOCKS", "error", !coalesce(col("_hastext"), lit(false)))))

    // all three per-type duplicate-id codes from one groupBy
    val dupCounts = blocks.groupBy("block_type", "doc_id", "block_id")
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
    val dups = checkFrame(dupCounts, Seq("text", "table", "image").map(t =>
      Check(s"DUPLICATE_${t.toUpperCase}_ID", "warning", col("block_type") === t)))

    Seq(metaChecks, docChecks, dups, rowChecks).reduce(_ unionByName _)
  }

  /** Synthetic block model over the documents table: every doc gets a text
    * block, every third a table or image block, with violations planted by
    * doc_id arithmetic so each code fires deterministically at every SF
    * (mirrored literally by the a13 oracle SQL). */
  def syntheticBlockModel(docs: DataFrame): (DataFrame, DataFrame) = {
    val d = col("doc_id")
    val meta = docs.select(d.as("doc_id"),
      when(d % 17 === 0, "").otherwise(concat(col("source"), lit("/"), d.cast("string"), lit(".pdf"))).as("file_name"),
      when(d % 23 === 0, 0).otherwise(10).as("page_count"))
    val page = when(d % 19 === 0, -1).when(d % 13 === 0, 12).otherwise((d % 10).cast("int") + 1)
    val bbox = when(d % 37 === 0, array(lit(0.0), lit(0.0), lit(5.0)))
      .when(d % 41 === 0, array(lit(-1.0), lit(0.0), lit(5.0), lit(5.0)))
      .otherwise(array(lit(0.0), lit(0.0), lit(5.0), lit(5.0)))
    val txt = docs.select(d.as("doc_id"), d.cast("string").as("block_id"), lit("text").as("block_type"),
      page.as("page"), when(d % 31 === 0, "x").otherwise(col("text")).as("content"), bbox.as("bbox"),
      when(d % 5 =!= 0, "s").as("section"), when(d % 7 =!= 0, "r").as("role"))
    val tbl = docs.filter(d % 3 === 1).select(d.as("doc_id"),
      concat(d.cast("string"), lit("-t")).as("block_id"), lit("table").as("block_type"),
      page.as("page"), bbox.as("bbox"),
      when(d % 11 === 0, array().cast("array<string>")).otherwise(array(lit("a"), lit("b"))).as("columns"),
      when(d % 47 === 0, array().cast("array<array<string>>"))
        .when(d % 43 === 0, array(array(lit("1")))).otherwise(array(array(lit("1"), lit("2")))).as("rows"),
      when(d % 53 =!= 0, "c").as("category"),
      when(d % 61 =!= 0, "transaction_table").as("role"))
    val img = docs.filter(d % 3 === 2).select(d.as("doc_id"),
      concat(d.cast("string"), lit("-i")).as("block_id"), lit("image").as("block_type"),
      page.as("page"),
      when(d % 59 =!= 0, concat(lit("/img/"), d.cast("string"))).as("image_path"))
    val blocks = txt
      .unionByName(tbl, allowMissingColumns = true)
      .unionByName(img, allowMissingColumns = true)
      .unionByName(txt.filter(d % 29 === 0), allowMissingColumns = true) // duplicate text ids
    (blocks, meta)
  }

  /** Run the full suite over the testdata: block-model validation over a
    * deterministic synthetic flattening of `documents`, plus star-schema
    * integrity checks. Lazy: materializing the report is the only action. */
  def validateAll(spark: SparkSession, dir: String): DataFrame = {
    import graft.tables.TestTables._
    val li = lineitem(spark, dir); val o = orders(spark, dir)
    val c = customer(spark, dir); val docs = documents(spark, dir)
    val (blocks, meta) = syntheticBlockModel(docs)
    val star = Seq(
      duplicateIdFrame(docs, Seq("doc_id"), "DUPLICATE_DOC_ID", "error"),
      checkFrame(docs, Seq(Check("MISSING_DOC_FIELDS", "error",
        Seq("doc_id", "text", "lang").map(f => col(f).isNull || (col(f).cast("string") === "")).reduce(_ || _)))),
      brokenRefFrame(li, "l_orderkey", o, "o_orderkey", "ORDER_KEY_BROKEN_REF", "error"),
      brokenRefFrame(o, "o_custkey", c, "c_custkey", "CUST_KEY_BROKEN_REF", "warning"),
      checkFrame(li, Seq(
        Check("DISCOUNT_OUT_OF_RANGE", "warning", col("l_discount") < 0.0 || col("l_discount") > 1.0),
        Check("NEGATIVE_PRICE", "error", col("l_extendedprice") < 0.0))))
    (validateBlocks(blocks, meta, longContent = 500) +: star).reduce(_ unionByName _)
  }
}
