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
