package graft

import org.apache.spark.sql.functions._
import graft.query.Ask
import graft.ops.Skew

class AskSkewSpec extends SparkSpec {
  import spark.implicits._

  test("Ask pipeline retrieves, reranks, filters, and caps to top-k") {
    val corpus = graft.tables.TestTables.documents(spark, sf)
    val hits = Ask.ask(corpus, "doc_id", "text", "spark join stream",
      Ask.AskConfig(topK = 5))
    val rows = hits.collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "hits must be score-descending")
    assert(scores.forall(_ >= 0.25))
    val sources = Ask.sources(hits, "doc_id", "text", maxChars = 50).collect()
    assert(sources.forall(_.getAs[String]("snippet").length <= 50))
  }

  test("Ask metadata filter restricts the corpus before scoring") {
    val corpus = graft.tables.TestTables.documents(spark, sf)
    val hits = Ask.ask(corpus, "doc_id", "text", "spark join",
      metadataFilter = col("lang") === "en")
    val langs = hits.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.toSeq == Seq("en"))
  }

  test("ask with scoreFn composes embedding similarity into the pipeline") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"),
        concat(lit("doc "), col("vec_id")).as("text"))
    val qv = emb.filter(col("doc_id") === 0).select(col("embedding").as("qv"))
    val corpus = emb.crossJoin(broadcast(qv))
    val hits = Ask.ask(corpus, "doc_id", "text", "irrelevant keywords",
      Ask.AskConfig(topK = 3, minScore = 0.0, semanticOnly = 0.0),
      scoreFn = Some(graft.index.Embed.cosine(col("embedding"), col("qv"))))
      .collect()
    assert(hits.length == 3)
    // the query vector itself must rank first under cosine scoring
    assert(hits.head.getAs[Long]("doc_id") == 0L)
    assert(math.abs(hits.head.getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("resolveShowTableTags substitutes, repeats, and strips unresolved") {
    val answers = Seq(
      (1L, "a [SHOW_TABLE:CAT=x] b [SHOW_TABLE:CAT=x] c"), // same tag twice
      (2L, "see [SHOW_TABLE:CAT=y] and [SHOW_TABLE:CAT=missing]"),
      (3L, "no tags here")).toDF("id", "answer")
    val tables = Seq(("x", "<table>X</table>"), ("y", "<table>Y</table>"),
      ("y", "<table>ZZZ-later</table>")).toDF("cat", "html")
    val out = Ask.resolveShowTableTags(answers, "id", "answer", tables, "cat", "html")
      .orderBy("id").collect().map(_.getAs[String]("answer"))
    val wrapX = "<br><div class='table-responsive'><table>X</table></div><br>"
    val wrapY = "<br><div class='table-responsive'><table>Y</table></div><br>"
    assert(out(0) == s"a $wrapX b $wrapX c")
    assert(out(1) == s"see $wrapY and ") // first-match on y; unresolved removed
    assert(out(2) == "no tags here")
  }

  test("qnaFallback accepts only close question matches") {
    val pairs = Seq(
      ("how do i reset the password", "use the reset link"),
      ("what is the capital of france", "paris")).toDF("question", "answer")
    val hit = Ask.qnaFallback(pairs, "question", "how do i reset the password", 0.75)
    assert(hit.count() == 1 && hit.collect()(0).getAs[String]("answer") == "use the reset link")
    val miss = Ask.qnaFallback(pairs, "question", "completely unrelated query text", 0.75)
    assert(miss.count() == 0)
  }

  test("saltedAgg equals plain aggregation on skewed data") {
    val skewed = (1 to 5000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i.toLong)).toDF("k", "v")
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8, Map("v" -> "sum"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = skewed.groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("skewJoin equals plain join on skewed fact") {
    val fact = (1 to 2000).map(i => (if (i % 4 == 0) 1L else (i % 50).toLong, i)).toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")
    val a = Skew.skewJoin(fact, dim, "k", Seq(1L), 8)
      .groupBy("name").count().orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = fact.join(dim, "k")
      .groupBy("name").count().orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }
}
