package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality assertion suite (SURVEY.md §5.2; ref `ingestion/validator.py`
  * issue codes `MISSING_DOC_ID`, `PAGE_COUNT_MISMATCH`, `ROW_LEN_MISMATCH`,
  * `DUPLICATE_TEXT_ID` as DataFrame checks).
  *
  * Each check returns (code, severity, n_violations) rows; `validateAll`
  * unions them into one report frame — the ref's per-doc validation.json as
  * a single distributed pass.
  */
object Validator {

  private def issue(spark: SparkSession, code: String, severity: String, n: Long): DataFrame = {
    import spark.implicits._
    Seq((code, severity, n)).toDF("code", "severity", "n_violations")
  }

  /** DUPLICATE_*_ID: key uniqueness. */
  def duplicateIds(df: DataFrame, keyCol: String): Long =
    df.groupBy(col(keyCol)).count().filter(col("count") > 1).count()

  /** MISSING_*: null/empty required field. */
  def missingRequired(df: DataFrame, cols: Seq[String]): Long =
    df.filter(cols.map(c => col(c).isNull || (col(c).cast("string") === "")).reduce(_ || _)).count()

  /** RANGE mismatch: value outside [lo, hi]. */
  def outOfRange(df: DataFrame, c: String, lo: Double, hi: Double): Long =
    df.filter(col(c) < lo || col(c) > hi).count()

  /** ROW_LEN_MISMATCH: ragged array-of-array rows. */
  def raggedRows(df: DataFrame, rowsCol: String): Long =
    df.filter(size(array_distinct(transform(col(rowsCol), r => size(r)))) > 1).count()

  /** Referential integrity: fk values absent from the dimension. */
  def brokenReferences(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
    fact.select(col(fk)).distinct()
      .join(dim.select(col(pk)).distinct(), col(fk) === col(pk), "left_anti").count()

  /** Run the suite over the testdata star schema → report frame. */
  def validateAll(spark: SparkSession, dir: String): DataFrame = {
    import graft.tables.TestTables._
    val li = lineitem(spark, dir); val o = orders(spark, dir)
    val c = customer(spark, dir); val docs = documents(spark, dir)
    Seq(
      issue(spark, "DUPLICATE_DOC_ID", "error", duplicateIds(docs, "doc_id")),
      issue(spark, "MISSING_DOC_FIELDS", "error", missingRequired(docs, Seq("doc_id", "text", "lang"))),
      issue(spark, "ORDER_KEY_BROKEN_REF", "error", brokenReferences(li, "l_orderkey", o, "o_orderkey")),
      issue(spark, "CUST_KEY_BROKEN_REF", "warning", brokenReferences(o, "o_custkey", c, "c_custkey")),
      issue(spark, "DISCOUNT_OUT_OF_RANGE", "warning", outOfRange(li, "l_discount", 0.0, 1.0)),
      issue(spark, "NEGATIVE_PRICE", "error", outOfRange(li, "l_extendedprice", 0.0, Double.MaxValue))
    ).reduce(_ unionByName _)
  }
}
