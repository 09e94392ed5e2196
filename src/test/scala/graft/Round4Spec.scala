package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cluster, Curation, TextAnalysis}
import graft.index.Bm25

/** Round-4 operators: BM25 retrieval, BPE pair counts, bigram events,
  * per-domain stats, and the exact k-means / SemDeDup path. */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // --- BM25 ---------------------------------------------------------------

  test("BM25 ranks term-bearing docs, drops zero-score docs, matches hand formula") {
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark and flink"),
      (3L, "nothing relevant at all")).toDF("id", "text")
    val out = Bm25.topK(docs, "id", "text", Seq("spark"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "doc 3 has no term and must be dropped")
    // hand computation: N=3, df=2, idf=ln(1+(3-2+0.5)/(2+0.5)); avgdl=(3+3+4)/3
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    val avgdl = 10.0 / 3.0
    def score(tf: Double, dl: Double) =
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0).getDouble(1) - score(3.0, 3.0)) < 1e-9)
    assert(math.abs(out(1).getDouble(1) - score(1.0, 3.0)) < 1e-9)
  }

  test("BM25 stats row carries n_docs, avgdl, and per-term dfs") {
    val docs = Seq("a b", "b c", "c d").toDF("text")
    val r = Bm25.corpusStats(docs, col("text"), Seq("b", "z")).collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Double]("avgdl") == 2.0)
    assert(r.getAs[Long]("df_0") == 2L && r.getAs[Long]("df_1") == 0L)
  }

  // --- BPE pairs / bigram events ------------------------------------------

  test("bpePairCounts counts every adjacent-symbol occurrence inside words only") {
    val docs = Seq("abc ab", "x ab").toDF("text")
    val m = TextAnalysis.bpePairCounts(docs, col("text"), topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // words: abc, ab, x, ab → pairs ab(×3: from abc, ab, ab), bc(×1); "x" yields none
    assert(m == Map("ab" -> 3L, "bc" -> 1L))
  }

  test("adjacentTokenPairs zip-shifts; 1-token and empty arrays yield no pairs") {
    val df = Seq(Seq("a", "b", "c"), Seq("a"), Seq.empty[String]).toDF("toks")
      .select(TextAnalysis.adjacentTokenPairs(col("toks")).as("pr"))
    val rows = df.collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1))))
    assert(rows(0) == Seq(("a", "b"), ("b", "c")))
    assert(rows(1).isEmpty && rows(2).isEmpty)
  }

  // --- domain stats -------------------------------------------------------

  test("domainStats computes keep band inclusively and the domain verdict") {
    val docs = Seq(
      ("a", 200L), ("a", 5000L), ("a", 100L),   // 2/3 in band → kept at 0.6
      ("b", 199L), ("b", 5001L)                  // 0/2 in band → dropped
    ).toDF("source", "n_chars")
    val m = Curation.domainStats(docs, col("source"), col("n_chars"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Long]("n_docs") == 3L)
    assert(m("a").getAs[Long]("total_chars") == 5300L)
    assert(m("a").getAs[Double]("keep_rate") == 2.0 / 3.0)
    assert(m("a").getAs[Long]("domain_kept") == 1L)
    assert(m("b").getAs[Double]("keep_rate") == 0.0 && m("b").getAs[Long]("domain_kept") == 0L)
  }

  // --- split assignment ---------------------------------------------------

  test("assignSplit is a proper ladder: exhaustive, stable, and rate-shaped") {
    val docs = spark.range(0, 10000).toDF("id")
    val out = docs.select(col("id"),
        TextAnalysis.assignSplit(col("id"), Seq("train" -> 0.8, "val" -> 0.9), "test").as("s"))
    val counts = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform: 10k keys land within a loose band of the 80/10/10 target
    assert(counts("train") > 7500 && counts("train") < 8500, s"got $counts")
    assert(counts("val") > 600 && counts("val") < 1400, s"got $counts")
    // deterministic: the same keys assign identically on a re-evaluation
    val again = docs.select(
      TextAnalysis.assignSplit(col("id"), Seq("train" -> 0.8, "val" -> 0.9), "test").as("s2"))
    assert(out.select("s").exceptAll(again.select(col("s2").as("s"))).isEmpty)
  }

  // --- source-format breadth ----------------------------------------------

  test("documents round-trip through JSONL and CSV sources losslessly") {
    // deterministic subset (a bare limit() re-evaluates per action and may
    // pick different rows for the write and the compare); per-run temp dirs
    // so concurrent test runs can't clobber each other
    val docs = graft.tables.TestTables.documents(spark, sf).filter(col("doc_id") < 200)
    val base = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val jdir = s"$base/jsonl"
    docs.write.mode("overwrite").json(jdir) // JSON lines, the interchange staple
    val jback = spark.read.schema(docs.schema).json(jdir)
    assert(jback.exceptAll(docs).isEmpty && docs.exceptAll(jback).isEmpty)
    val cdir = s"$base/csv"
    docs.write.mode("overwrite").option("header", true).csv(cdir)
    // multiLine: text columns carry newlines inside quoted fields
    val cback = spark.read.schema(docs.schema)
      .option("header", true).option("multiLine", true).csv(cdir)
    assert(cback.exceptAll(docs).isEmpty && docs.exceptAll(cback).isEmpty)
  }

  // --- unicode normalization ----------------------------------------------

  test("nfcNormalize composes decomposed sequences, is idempotent, keeps NFC text identical") {
    val decomposed = "cafe\u0301 a\u0308 \u0e44\u0e17\u0e22" // explicit escapes, no raw combining chars
    val df = Seq(decomposed, "plain ascii", "\u00e9").toDF("t")
      .select(col("t"), graft.ops.Cleaning.nfcNormalize(col("t")).as("n"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows(decomposed) == "caf\u00e9 \u00e4 \u0e44\u0e17\u0e22")
    assert(rows("plain ascii") == "plain ascii")
    assert(rows("\u00e9") == "\u00e9")
    val twice = Seq(rows(decomposed)).toDF("t")
      .select(graft.ops.Cleaning.nfcNormalize(col("t")).as("n")).collect()(0).getString(0)
    assert(twice == rows(decomposed), "NFC must be idempotent")
  }

  // --- winnowing ----------------------------------------------------------

  test("winnowing guarantees a shared fingerprint for a long shared substring") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq("AAAA " + shared + " BBBB", "cccc " + shared + " dddd", "zz unrelated zz")
      .toDF("t").select(TextAnalysis.winnowingFingerprints(col("t"), k = 5, w = 4).as("fp"))
    val fps = df.collect().map(_.getSeq[String](0).toSet)
    assert((fps(0) intersect fps(1)).nonEmpty,
      "docs sharing a 43-char substring must share a winnowed fingerprint")
    assert((fps(0) intersect fps(2)).isEmpty, "unrelated docs should not collide")
  }

  test("winnowing short-text conventions: sub-k text hashes whole, sub-w windows collapse") {
    val df = Seq("abc", "abcdefg").toDF("t")
      .select(col("t"), TextAnalysis.winnowingFingerprints(col("t"), k = 5, w = 4).as("fp"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(rows("abc").length == 1, "text shorter than k → one fingerprint (md5 of the text)")
    // 7 chars → 3 grams → fewer than w hashes → one window over them all
    assert(rows("abcdefg").length == 1)
  }

  // --- k-means / SemDeDup -------------------------------------------------

  private val init2 = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))

  test("lloydOnce recomputes per-cell element-wise means exactly") {
    val emb = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(9.0f, 10.0f)), (4L, Seq(10.0f, 9.0f))).toDF("vec_id", "embedding")
    val cents = Cluster.lloydOnce(emb, "embedding", init2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(0) == Seq(0.5, 0.5))
    assert(cents(1) == Seq(9.5, 9.5))
  }

  test("assign takes the nearest updated centroid; exact ties go to the lower cell") {
    val emb = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(9.0f, 10.0f)), (4L, Seq(10.0f, 9.0f)),
      (5L, Seq(5.0f, 5.0f))).toDF("vec_id", "embedding") // equidistant from (0.5,0.5) and (9.5,9.5)
    val cents = Cluster.lloydOnce(emb.filter(col("vec_id") <= 4), "embedding", init2)
    val cells = Cluster.assign(emb, "embedding", "vec_id", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(cells(1) == 0 && cells(2) == 0 && cells(3) == 1 && cells(4) == 1)
    assert(cells(5) == 0, "tie must break to the lower cell id")
  }

  test("lloyd loop is a fixed point once assignments stop moving") {
    val emb = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(9.0f, 10.0f)), (4L, Seq(10.0f, 9.0f))).toDF("vec_id", "embedding")
    // this toy set converges after one update, so extra rounds must not move
    // the centroids (decimal-exact means make the fixed point bit-stable)
    val once = Cluster.lloydOnce(emb, "embedding", init2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val thrice = Cluster.lloyd(emb, "embedding", "vec_id", init2, iterations = 3)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(thrice == once)
  }

  test("semanticDupPairs pairs near-identical vectors only within their cluster") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.01f)),     // near-dups, cell 0
      (3L, Seq(9.0f, 9.0f)), (4L, Seq(0.0f, 9.5f))).toDF("vec_id", "embedding")
    val pairs = Cluster.semanticDupPairs(emb, "embedding", "vec_id", init2, threshold = 0.99)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      "only the co-clustered near-dup pair qualifies; cross-cluster pairs are never scored")
  }

  test("semanticDupPairs on the gate corpus is non-vacuous and symmetric-free") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val init = Cluster.seededCentroids(4, 64, seed = 11, scale = 0.05)
    val pairs = Cluster.semanticDupPairs(emb, "embedding", "vec_id", init, threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  // --- hard negatives -------------------------------------------------------

  test("hardNegatives ranks wrong-label neighbors by cosine and never pairs same-label") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 1),  // nearest wrong-label for anchor 1
      (3L, Seq(0.0f, 1.0f), 1),  // farther wrong-label
      (4L, Seq(1.0f, 0.05f), 0)) // same label as 1 — excluded
      .toDF("vec_id", "embedding", "label")
    val out = graft.index.Search
      .hardNegatives(emb, "embedding", "vec_id", "label", Seq(Seq(0.0, 0.0)), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val for1 = out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(for1 == Seq(2L, 3L), "anchor 1's negatives are 2 (closest) then 3, never same-label 4")
    val labels = Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0)
    assert(out.forall { case (a, b, _) => labels(a) != labels(b) })
    assert(out.groupBy(_._1).forall(_._2.length <= 2), "k caps negatives per anchor")
  }

  // --- simhash pairs --------------------------------------------------------

  test("simHashDuplicates pairs identical docs at hamming 0, skips unrelated docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // identical text
      (3L, "totally different words nothing shared here at all"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.simHashDuplicates(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L },
      "identical texts share the signature exactly")
    assert(!out.exists { case (a, b, _) => a == 3L || b == 3L },
      "a doc with fully disjoint shingles must not pair (random distance ≈ bits/2)")
    assert(out.forall { case (a, b, _) => a < b }, "pairs are ordered, never mirrored")
  }

  // --- URL canonicalization ------------------------------------------------

  test("normalizeUrl lowercases scheme/host, drops default ports, tracking params, fragments") {
    val cases = Seq(
      "HTTPS://WWW.Site.COM:443/A/B//?utm_source=x&ref=y&b=2&a=1#frag",
      "http://site.com:8080/p", // non-default port survives
      "https://site.com",       // empty path -> '/'
      "http://www.site.com:80/?gclid=1&fbclid=2&utm_campaign=z") // all params tracked
    val out = cases.toDF("u")
      .select(TextAnalysis.normalizeUrl(col("u")).as("n")).collect().map(_.getString(0))
    assert(out(0) == "https://site.com/A/B?a=1&b=2")
    assert(out(1) == "http://site.com:8080/p")
    assert(out(2) == "https://site.com/")
    assert(out(3) == "http://site.com/")
  }

  test("normalizeUrl makes param order and www-prefix collide to one key") {
    val df = Seq("https://www.s.com/p?b=2&a=1", "HTTPS://S.com/p/?a=1&b=2").toDF("u")
      .select(TextAnalysis.normalizeUrl(col("u")).as("n"))
    assert(df.distinct().count() == 1)
  }

  test("normalizeUrl edge cases: scheme-less passthrough, userinfo strip, uppercase trackers") {
    val out = Seq(
      "example.com/a#frag",                 // no scheme: pass through minus fragment
      "other.org/b",                        // no scheme: must NOT collide with the above
      "https://alice:pw@a.com/x",           // userinfo stripped, host is a.com
      "https://s.com/p?UTM_SOURCE=mail")    // uppercase tracker still dropped
      .toDF("u").select(TextAnalysis.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == "example.com/a")
    assert(out(1) == "other.org/b")
    assert(out(2) == "https://a.com/x")
    assert(out(3) == "https://s.com/p")
  }

  // --- span dedup -----------------------------------------------------------

  test("spanDedup keeps the first corpus-wide occurrence of each span and reassembles in order") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ") // exactly one 8-token span
    val docs = Seq(
      (1L, shared + " unique one two three"),
      (2L, shared + " other tail words here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.spanDedup(docs, col("doc_id"), col("text"), 8)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2) // doc 1 keeps both spans
    assert(out(0).getString(3) == shared + " unique one two three")
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 1,
      "doc 2's copy of the shared span must be dropped")
    assert(out(1).getString(3) == "other tail words here")
    assert(out(2).getLong(1) == 0 && out(2).getString(3) == "")
  }

  test("spanDedup treats NULL text as an empty document, not a NULL row") {
    val docs = Seq((1L, Option("a b")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val r = TextAnalysis.spanDedup(docs, col("doc_id"), col("text"), 8)
      .filter(col("doc_id") === 2).collect()(0)
    assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getString(3) == "")
  }

  test("spanDedup dedupes repeated spans inside one document too") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, s"$span $span")).toDF("doc_id", "text")
    val r = TextAnalysis.spanDedup(docs, col("doc_id"), col("text"), 8).collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 1 && r.getString(3) == span)
  }

  test("spanSegments covers every token exactly once with a ragged tail") {
    val df = Seq("a b c d e f g h i j").toDF("t")
      .select(TextAnalysis.spanSegments(col("t"), 4).as("s"))
    assert(df.collect()(0).getSeq[String](0) == Seq("a b c d", "e f g h", "i j"))
  }

  // --- mixture weights ------------------------------------------------------

  test("mixtureWeights: weights sum to ~1 and alpha=0.5 up-samples small domains") {
    val docs = Seq.tabulate(90)(i => ("big", "w " * 20)) ++ Seq.tabulate(10)(i => ("small", "w " * 20))
    val df = docs.toDF("source", "text")
    val out = Curation.mixtureWeights(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-5)
    assert(out("small")._2 > 1.0, "small domain is up-sampled (epochs > 1)")
    assert(out("big")._2 < 1.0, "big domain is down-sampled")
    // sqrt flattening: weight ratio is sqrt(9) = 3, not 9
    assert(math.abs(out("big")._1 / out("small")._1 - 3.0) < 1e-4)
  }

  test("audioWindows covers every payload byte with overlapping windows") {
    import graft.ops.Multimodal
    val df = Seq((1L, "x" * 250), (2L, "y" * 80)).toDF("doc_id", "text")
    val out = Multimodal.audioWindows(Multimodal.asMediaColumn(df, "text", "audio"), 120L, 50L)
      .select("doc_id", "win_start", "win_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d1 = out.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted.toSeq
    // 250 bytes, win 120 hop 50: starts 0,50,100,150 — last truncated to 100
    assert(d1 == Seq((0L, 120L), (50L, 120L), (100L, 120L), (150L, 100L)))
    assert(d1.last._1 + d1.last._2 == 250L, "final window reaches the payload end")
    val d2 = out.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq
    assert(d2 == Seq((0L, 80L)), "sub-window payload yields one covering window")
  }

  test("documents round-trip through the ORC source losslessly") {
    val docs = graft.tables.TestTables.documents(spark, sf).filter(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/orc"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docs.schema).orc(dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
