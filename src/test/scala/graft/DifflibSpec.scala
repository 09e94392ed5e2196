package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** DifflibRatioExpr vs CPython difflib.SequenceMatcher ground truth
  * (expected values computed with CPython 3.11 difflib). */
class DifflibSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    ("how do i reset the password", "how to reset a password", 0.84),
    ("abcd", "bcde", 0.75),
    ("same", "same", 1.0),
    ("", "x", 0.0),
    ("kitten", "sitting", 0.6153846153846154),
    ("the quick brown fox", "the quick brown fox jumps", 0.8636363636363636),
    ("abab", "baba", 0.75),
    ("ประเทศไทย", "ประเทศลาว", 0.6666666666666666))

  test("difflib_ratio matches CPython difflib exactly (SQL registration path)") {
    GraftFunctions.register(spark)
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .selectExpr("difflib_ratio(a, b) AS r").collect().map(_.getDouble(0)).toSeq
    got.zip(cases.map(_._3)).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"got $g expected $e")
    }
  }

  test("difflib_ratio via extensions-injected function and Column API") {
    implicit val s = spark
    val r = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(GraftFunctions.difflib_ratio(col("a"), col("b")).as("r"))
      .collect()(0).getDouble(0)
    assert(math.abs(r - 0.6153846153846154) < 1e-12)
  }

  test("difflib_ratio survives codegen over a real column scan") {
    GraftFunctions.register(spark)
    val docs = graft.tables.TestTables.documents(spark, sf).limit(100)
    val out = docs.selectExpr("difflib_ratio(substr(text, 1, 30), substr(text, 2, 30)) AS r")
      .collect().map(_.getDouble(0))
    assert(out.forall(r => r >= 0.0 && r <= 1.0))
    assert(out.exists(r => r > 0.5), "shifted substrings should be similar")
  }

  test("qnaFallback with difflib similarity accepts the reference's threshold semantics") {
    GraftFunctions.register(spark)
    val pairs = Seq(("how do i reset the password", "use the reset link")).toDF("question", "answer")
    val sim = expr("difflib_ratio(lower(question), 'how to reset a password')")
    val hit = pairs.withColumn("match_score", sim).filter(col("match_score") >= 0.75)
    assert(hit.count() == 1) // 0.84 ≥ 0.75 — accepted, as in the ref
  }
}
