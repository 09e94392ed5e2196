package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in `graft.queries.*` (one `Q` per SURVEY §2
  * row: Spark implementation + DuckDB oracle SQL); the underlying operator
  * implementations live in `graft.ops`, `graft.index`, `graft.stream`.
  */
object SparkEntry {

  private val querySets: Seq[QuerySet] =
    Seq(Relational, WindowQueries, TextQueries, VectorQueries, StreamingQueries,
      TableQueries, MiscQueries)

  private lazy val catalog: Seq[Q] = querySets.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end ask-pipeline slice: clean → score → threshold-filter →
    * top-k (SURVEY §3.2 steps 3–6 as one DataFrame). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val docs = graft.tables.TestTables.documents(spark, d)
    val score = graft.index.Rerank.sigmoid(
      graft.index.Rerank.keywordScore(col("text"), Seq("spark", "join", "stream"), "spark join"))
    val overlap = graft.index.Rerank.keywordOverlap(col("text"),
      lit("spark join stream"), Seq("the", "a"))
    docs
      .select(col("doc_id"), graft.ops.Cleaning.normalizeText(col("text")).as("content"),
        score.as("score"), overlap.as("overlap"))
      .filter(graft.index.Rerank.relevanceFilter(col("score"), col("overlap"), 0.25, 0.75))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
