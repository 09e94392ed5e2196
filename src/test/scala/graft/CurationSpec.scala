package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation
import graft.ops.Curation.CurationConfig

/** Planted-document fixtures: each curation stage must drop exactly its
  * target and nothing else. Bodies are word-disjoint across survivors so
  * the near-dup stage only links the planted pair. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val bodyA =
    "the quick review of a corpus and the slow merge of its filters keeps " +
      "the value of every document and the shape of all text intact "
  private val bodyB =
    "the random walk of a weighted graph converges and probability mass " +
      "spreads along every reachable edge in finite expected time for the connected parts "
  private val bodyC =
    "nine silver planets orbit distant suns while comets trace bright arcs " +
      "across the winter sky and a telescope records every path "

  test("each stage drops its planted document; survivors keep redacted text") {
    val corpus = Seq(
      (2L, bodyA + "alpha closing thoughts", "en"),          // survivor
      (4L, "x", "en"),                                       // low quality
      (6L, bodyA + "alpha closing thoughts", "en"),          // exact dup of 2
      (8L, bodyA + "alpha closing thoughts today", "en"),    // near dup of 2
      (10L, bodyB + "contact sam@corp.example.com for data", "en"), // survivor with PII
      (12L, bodyC + "held out benchmark question words repeated", "en") // contaminated
    ).toDF("doc_id", "text", "lang")
    val evalSet = Seq((100L, "held out benchmark question words repeated verbatim", "en"))
      .toDF("doc_id", "text", "lang")
    // rates = 1.0 so sampling keeps everything — isolates stages 1-5
    val out = Curation.curate(corpus, "doc_id", "text", "lang", evalSet,
      CurationConfig(jaccard = 0.7, rates = Seq("en" -> 1.0), defaultRate = 1.0))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.keySet == Set(2L, 10L))
    assert(out(10L).contains("<EMAIL>") && !out(10L).contains("sam@corp.example.com"))
  }

  test("stratified mixing keeps each stratum at its own rate, deterministically") {
    // word-disjoint numbered tails keep the 400 docs from near-dup'ing
    val corpus = (1L to 400L).map(i =>
      (i, bodyA + s" marker word$i tail$i item${i * 31} note${i * 17}", if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "text", "lang")
    val evalSet = Seq((0L, "zzz qqq yyy www", "en")).toDF("doc_id", "text", "lang")
    val cfg = CurationConfig(rates = Seq("en" -> 1.0, "zh" -> 0.0))
    val out = Curation.curate(corpus, "doc_id", "text", "lang", evalSet, cfg)
    val langs = out.groupBy("stratum").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.getOrElse("zh", 0L) == 0L)
    assert(langs("en") == 200L)
    // determinism: a second run yields the identical id set
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.curate(corpus, "doc_id", "text", "lang", evalSet, cfg)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }
}
