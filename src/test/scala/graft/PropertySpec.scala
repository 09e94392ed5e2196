package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Dedup, Chunking}

/** Property-style tests for the parser/normalizer surface (SURVEY.md §5
  * plan): money-parse round-trip, normalization idempotence, fingerprint
  * stability, exact-chunker invariants — seeded random sampling through
  * the same Catalyst path production uses. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  test("parseMoney round-trips formatted positive and accounting-negative amounts") {
    val vs = Seq.fill(200)(rng.nextLong(9999999900L).abs / 100.0)
    val formatted = vs.map(v => f"$$${v}%,.2f") ++ vs.map(v => f"(${v}%,.2f)")
    val out = formatted.toDF("t").select(Cleaning.parseMoney(col("t")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    val expected = vs.map(v => Some(v)) ++ vs.map(v => Some(-v))
    assert(out == expected)
  }

  test("normalizeText is idempotent on random printable strings") {
    val alphabet = "ab c\t\nd.,  e"
    val ss = Seq.fill(300)((0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val once = ss.toDF("t").select(Cleaning.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("t").select(Cleaning.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once)
  }

  test("fingerprint is stable and collision-free across distinct inputs (sampled)") {
    val ss = (1 to 200).map(i => s"content body $i")
    def fps = ss.toDF("t").select(Chunking.fingerprint(col("t")).as("f"))
      .collect().map(_.getString(0)).toSeq
    val a = fps
    assert(a.distinct.size == ss.size)
    assert(a == fps)
  }

  test("chunkIdExact: ids monotone by +0/+1; no multi-row chunk exceeds the budget") {
    (1 to 5).foreach { _ =>
      val ls = Seq.fill(40)(1L + rng.nextInt(800))
      val rows = ls.zipWithIndex.map { case (l, i) => ("k", i.toLong, l, false) }
      val out = Chunking.chunkIdExact(rows.toDF("k", "ord", "len", "brk"),
        "k", "ord", "len", "brk", maxChars = 1200)
        .orderBy("ord").collect().map(_.getLong(2)).toSeq
      assert(out.zip(out.drop(1)).forall { case (a, b) => b == a || b == a + 1 })
      val byChunk = ls.zip(out).groupBy(_._2).values.toSeq
      byChunk.foreach { chunk =>
        val s = chunk.map(_._1).sum
        assert(s <= 1200 || chunk.size == 1, s"chunk sum $s over budget with ${chunk.size} rows")
      }
    }
  }

  test("wordShingles produces n-w+1 distinct shingles for long texts") {
    val out = Seq("a b c d e f g").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3).as("s")).collect()(0).getSeq[String](0)
    assert(out.size == 5 && out.head == "a b c")
  }

  test("approx_count_distinct stays within HLL error of exact") {
    val docs = graft.tables.TestTables.documents(spark, sf)
    val approx = docs.agg(approx_count_distinct(col("doc_id"), 0.02)).collect()(0).getLong(0)
    val exact = docs.select(col("doc_id")).distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  // ---- native expressions ≡ the HOF formulations they replaced ----
  // The oracle only exercises the test corpus; these pin the equivalence on
  // seeded random inputs including unicode, repeats, empties, and the
  // short-input fallbacks.

  private def randomTexts(n: Int, unicode: Boolean): Seq[String] = {
    val words = Seq("spark", "join", "δédüp", "流", "a", "bb", "x1", "", "the")
    val pool = if (unicode) words else words.filter(w => w.nonEmpty && w.forall(_ < 128))
    Seq.fill(n)((0 until rng.nextInt(24)).map(_ => pool(rng.nextInt(pool.length))).mkString(" "))
  }

  test("array_dot equals the interpreted aggregate(zip_with) fold bit-for-bit") {
    val vecs = Seq.fill(150)(Seq.fill(16)(rng.nextGaussian().toFloat))
    val pairs = vecs.zip(vecs.reverse).toDF("a", "b")
    val out = pairs.select(
      graft.index.Embed.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(out.forall(r => java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("array_dot rejects decimal arrays at analysis time (no runtime blowup)") {
    // DecimalType is NumericType but has no primitive accessor — it must be
    // refused by checkInputDataTypes, not fail inside eval/codegen
    val df = Seq((Seq(BigDecimal(1.5)), Seq(BigDecimal(2.5)))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.index.Embed.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("non-decimal"))
    // the documented workaround — cast to double first — works
    val ok = df.select(graft.index.Embed.dot(
      col("a").cast("array<double>"), col("b").cast("array<double>")).as("d")).collect()
    assert(ok(0).getDouble(0) == 3.75)
  }

  test("minhash_mins equals per-rotation array_min over rotated digests") {
    val df = randomTexts(120, unicode = false).toDF("t")
      .withColumn("hs", transform(split(col("t"), " "), x => md5(x)))
    val native = df.select(Dedup.minHashSignature(col("hs"), 4).as("sig"))
    val hof = df.select(array((0 until 4).map { i =>
      val r = Dedup.rotationOffset(i)
      array_min(transform(col("hs"), h => concat(substring(h, r + 1, 32 - r), substring(h, 1, r))))
    }: _*).as("sig"))
    assert(native.collect().map(_.getSeq[String](0)).toSeq ==
      hof.collect().map(_.getSeq[String](0)).toSeq)
  }

  test("simhash_bits equals the zip_with vote fold") {
    val texts = randomTexts(120, unicode = true)
    val native = texts.toDF("t").select(Dedup.simHash(col("t"), 16).as("s"))
      .collect().map(_.getString(0)).toSeq
    val hof = texts.toDF("t").select({
      val toks = filter(split(lower(col("t")), "\\s+"), t => t =!= "")
      val hashes = transform(toks, t => md5(t))
      val votes = aggregate(hashes, array_repeat(lit(0), 16), (acc, h) =>
        zip_with(acc,
          transform(sequence(lit(1), lit(16)),
            j => when(substring(h, j, lit(1)).rlike("[89a-f]"), 1).otherwise(-1)),
          (a, b) => a + b))
      concat_ws("", transform(votes, v => when(v >= 0, "1").otherwise("0"))).as("s")
    }).collect().map(_.getString(0)).toSeq
    assert(native == hof)
  }

  test("char_ngrams equals the zip-shift + array_distinct formulation (incl. unicode)") {
    val texts = randomTexts(150, unicode = true)
    val native = texts.toDF("t").select(Dedup.charNgrams(lower(col("t")), 3).as("g"))
      .collect().map(_.getSeq[String](0)).toSeq
    val hof = texts.toDF("t").select({
      val chars = split(lower(col("t")), "")
      val len = size(chars)
      val joined = (2 to 3).foldLeft(chars) { (acc, k) =>
        zip_with(acc, slice(chars, lit(k), greatest(len - k + 1, lit(0))), (a, b) => concat(a, b))
      }
      array_distinct(
        when(len >= 3, slice(joined, lit(1), len - 3 + 1)).otherwise(array(lower(col("t"))))).as("g")
    }).collect().map(_.getSeq[String](0)).toSeq
    assert(native == hof)
  }

  test("word_shingles equals the zip-shift formulation (incl. short-text fallback)") {
    val texts = randomTexts(150, unicode = true)
    val native = texts.toDF("t").select(Dedup.wordShingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    val hof = texts.toDF("t").select({
      val toks = filter(split(lower(col("t")), "\\s+"), t => t =!= "")
      val n = size(toks)
      val joined = (2 to 3).foldLeft(toks) { (acc, k) =>
        zip_with(acc, slice(toks, lit(k), greatest(n - k + 1, lit(0))), (a, b) => concat(a, lit(" "), b))
      }
      array_distinct(
        when(n >= 3, slice(joined, lit(1), n - 3 + 1)).otherwise(array(concat_ws(" ", toks)))).as("s")
    }).collect().map(_.getSeq[String](0)).toSeq
    assert(native == hof)
  }

  test("winnow_hashes equals the zip-shift + window-min formulation (incl. unicode)") {
    val texts = randomTexts(150, unicode = true)
    val native = texts.toDF("t")
      .select(graft.ops.TextAnalysis.winnowingFingerprints(lower(col("t")), k = 5, w = 4).as("fp"))
      .collect().map(_.getSeq[String](0)).toSeq
    val hof = texts.toDF("t").select({
      val chars = split(lower(col("t")), "")
      val len = size(chars)
      val joined = (2 to 5).foldLeft(chars) { (acc, k) =>
        zip_with(acc, slice(chars, lit(k), greatest(len - k + 1, lit(0))), (a, b) => concat(a, b))
      }
      val grams = when(len >= 5, slice(joined, lit(1), len - 5 + 1)).otherwise(array(lower(col("t"))))
      val hs = transform(grams, g => md5(g))
      val wins = when(size(hs) >= 4,
          transform(sequence(lit(1), size(hs) - 3), j => array_min(slice(hs, j, lit(4)))))
        .otherwise(array(array_min(hs)))
      array_distinct(wins).as("fp")
    }).collect().map(_.getSeq[String](0)).toSeq
    assert(native == hof)
  }

  test("Pii.redact is idempotent on random identifier-laced strings") {
    // placeholders carry no digits or '@', so a second pass must be a no-op
    val parts = Seq("call ", "+1-202-555-0143", " or ", "bob@x.example.com", " ip ",
      "10.0.0.1", " t 192.168. ", "word ", "+66(2)1230456", "a@b", " 7 ")
    // adversarial: no separators — glued identifiers ("a@b.comx@y.com") make
    // the greedy classes split matches oddly, but a second pass must still
    // be a no-op
    val glued = Seq.fill(300)((0 until rng.nextInt(8)).map(_ => parts(rng.nextInt(parts.length))).mkString)
    val once = glued.toDF("t").select(graft.ops.Pii.redact(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("t").select(graft.ops.Pii.redact(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once)
    // realistic: space-separated identifiers must all be caught
    val spaced = Seq.fill(300)((0 until rng.nextInt(8)).map(_ => parts(rng.nextInt(parts.length))).mkString(" "))
    val clean = spaced.toDF("t").select(graft.ops.Pii.redact(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(clean.forall(s => !s.contains("@x.example.com") && !s.contains("10.0.0.1")))
  }

  test("curation survivors are a subset of the corpus with unchanged ids and strata") {
    val docs = graft.tables.TestTables.documents(spark, sf)
    val out = graft.ops.Curation.curate(
      docs.filter(col("doc_id") % 13 =!= 0), "doc_id", "text", "lang",
      docs.filter(col("doc_id") % 13 === 0))
    val joined = out.join(docs.select(col("doc_id").as("id"), col("lang").as("l")), Seq("id"), "left")
    assert(joined.filter(col("l").isNull || col("l") =!= col("stratum")).count() == 0)
    assert(out.count() < docs.count())
  }

  test("normalizeUrl is idempotent: a canonical URL maps to itself") {
    val hosts = Seq("A.com", "www.B.org", "alice@C.net:443", "d.io:8080")
    val urls = for (h <- hosts; p <- Seq("", "/x/y//", "/x?b=2&utm_source=z&a=1#f"))
      yield s"HTTPS://$h$p"
    val once = urls.toDF("u")
      .select(graft.ops.TextAnalysis.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("u")
      .select(graft.ops.TextAnalysis.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once)
  }

  test("spanDedup invariants on the gate corpus: kept ≤ total, singleton corpus keeps everything") {
    val docs = graft.tables.TestTables.documents(spark, sf)
    val out = graft.ops.TextAnalysis.spanDedup(docs, col("doc_id"), col("text"), 8)
    assert(out.filter(col("n_kept") > col("n_spans")).count() == 0)
    assert(out.count() == docs.count(), "one output row per input document")
    // a document processed ALONE keeps one copy of each DISTINCT span —
    // internal duplicate spans still dedup, so equality with n_spans would
    // be an accident of the fixture, not an invariant
    val alone = graft.ops.TextAnalysis.spanDedup(
      docs.filter(col("doc_id") === 7), col("doc_id"), col("text"), 8).collect()(0)
    val distinctSpans = docs.filter(col("doc_id") === 7)
      .select(graft.ops.TextAnalysis.spanSegments(col("text"), 8).as("s"))
      .collect()(0).getSeq[String](0).distinct.size
    assert(alone.getLong(2) == distinctSpans)
    // kept_text tokens are a subset of the original tokens
    val orig = docs.filter(col("doc_id") === 7).select(col("text")).collect()(0).getString(0)
    val keptToks = alone.getString(3).split("\\s+").toSet
    assert(keptToks.subsetOf(orig.toLowerCase.split("\\s+").toSet + ""))
  }

  test("mixtureWeights sums to ~1 for random domain splits; uniform split → uniform weights") {
    val docs = (1 to 300).map(i => (s"dom${rng.nextInt(7)}", "w " * (5 + rng.nextInt(20)))).toDF("source", "text")
    val out = graft.ops.Curation.mixtureWeights(docs, col("source"), col("text")).collect()
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    val uniform = (1 to 100).map(i => (s"u${i % 4}", "a b c d e")).toDF("source", "text")
    val uw = graft.ops.Curation.mixtureWeights(uniform, col("source"), col("text"))
      .collect().map(_.getDouble(3))
    assert(uw.forall(w => math.abs(w - 0.25) < 1e-6), s"uniform corpus → 0.25 each, got ${uw.toSeq}")
  }

  test("x14 decile cuts are monotone and every decile is non-empty on the gate corpus") {
    val rows = graft.queries.MiscQueries.x14QualityBuckets.fn(spark, sf).collect()
    val byDecile = rows.groupBy(_.getLong(2))
    assert(byDecile.keySet == (1L to 10L).toSet, s"all 10 deciles populated: ${byDecile.keySet}")
    // quality ranges must be ordered across deciles: max(d) <= min(d+1) can
    // be violated only at exact-cut ties, which strict < sends downward
    val ordered = (1L to 9L).forall { d =>
      byDecile(d).map(_.getDouble(1)).max <= byDecile(d + 1).map(_.getDouble(1)).min + 1e-9 }
    assert(ordered, "decile quality ranges must not interleave")
  }

  test("CDC chunks partition every random string exactly; boundaries are stable") {
    val alphabet = "abcdefgh ijklmn opqrstu vwxyz,.!?"
    val ss = (1 to 120).map(i =>
      (0 until (20 + rng.nextInt(400))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = ss.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def run() = graft.ops.Chunking.cdcChunks(df, col("id"), col("text"), w = 16, divisor = 64)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val out = run()
    // exact partition: per doc, chunk lengths sum to the text length
    val lenByDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    ss.zipWithIndex.foreach { case (t, i) =>
      assert(lenByDoc.getOrElse(i.toLong, 0L) == t.length.toLong,
        s"doc $i: chunks must cover the text exactly")
    }
    // chunk indices are 1..n contiguous
    out.groupBy(_._1).foreach { case (d, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq, s"doc $d chunk indices")
    }
    // determinism across runs
    assert(run() == out)
  }

  test("BPE encode reconstructs every word under any learned merge list") {
    val corpus = Seq.fill(40)(
      (0 until (3 + rng.nextInt(8))).map(_ => "abcdef" (rng.nextInt(6)).toString * (1 + rng.nextInt(4))).mkString).mkString(" ")
    val docs = Seq(corpus).toDF("text")
    val merges = graft.ops.TextAnalysis.bpeTrain(docs, col("text"), nMerges = 6)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val words = corpus.split(" ").filter(_.matches("[a-z]+")).distinct.toSeq
    val enc = words.toDF("w")
      .select(col("w"), graft.ops.TextAnalysis.bpeEncode(col("w"), merges).as("syms"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    enc.foreach { case (w, syms) =>
      assert(syms.mkString == w, s"symbols must concatenate back to '$w', got $syms")
      assert(syms.forall(_.nonEmpty), "no empty symbols")
    }
  }

  test("CMS estimates dominate exact counts on a random corpus") {
    val words = (1 to 60).map(i => s"tok$i")
    val corpus = (1 to 800).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    // plant the corpus into the sk1 shape directly (the query reads the
    // documents table; this re-runs its aggregation chain on random data)
    val cnt = Seq(corpus).toDF("text")
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ev = cnt.select(col("w"), col("cnt"), explode(sequence(lit(0), lit(3))).as("r"))
      .withColumn("dig", md5(concat(col("r").cast("string"), lit(":"), col("w")).cast("binary")))
      .withColumn("bucket", conv(substring(col("dig"), 31, 2), 16, 10).cast("long"))
    val sketch = ev.groupBy("r", "bucket").agg(sum("cnt").as("c"))
    val est = ev.join(sketch, Seq("r", "bucket"))
      .groupBy("w", "cnt").agg(min("c").as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (w, exact, e) =>
      assert(e >= exact, s"CMS under-counted $w: est=$e exact=$exact")
    }
  }

  test("simhash_bits64 emits exactly `bits` 0/1 chars and is deterministic") {
    graft.functions.GraftFunctions.register(spark)
    val ss = (1 to 50).map(i => s"random doc number $i with shared words").toDF("t")
    def sigs = ss.select(expr("simhash_bits64(array(md5(t)), 64)").as("s"))
      .collect().map(_.getString(0)).toSeq
    val a = sigs
    assert(a.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(a == sigs)
  }

  test("charEntropy: 0 ≤ H ≤ ln(alphabet); uniform alphabet hits the bound, single char hits 0") {
    val docs = Seq(
      1L -> "aaaaaaaa",              // H = 0
      2L -> "abcdabcdabcd",          // uniform over 4 → H = ln 4
      3L -> "aab",                   // 2/3, 1/3 mix
      4L -> Seq.fill(50)(rng.nextPrintableChar()).mkString).toDF("id", "t")
    val out = graft.ops.TextAnalysis.charEntropy(docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 == 0.0)
    assert(math.abs(out(2L)._3 - math.log(4)) < 1e-9)
    out.values.foreach { case (n, u, h) =>
      assert(h >= -1e-12 && h <= math.log(u.toDouble) + 1e-9, s"H=$h outside [0, ln($u)]")
      assert(u <= n)
    }
  }

  test("luhnCheckDigit generates numbers luhn_check accepts, for random payloads") {
    val payloads = Seq.fill(200)((1 to 10 + rng.nextInt(9)).map(_ => rng.nextInt(10)).mkString)
    val ok = payloads.toDF("p")
      .select(concat(col("p"), graft.ops.Pii.luhnCheckDigit(col("p")).cast("string")).as("card"))
      .select(graft.ops.Pii.luhnValid(col("card")).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(ok.forall(identity), "generated check digit rejected by luhn_check")
  }

  test("mainContent output text is a subsequence of the stripped input lines") {
    val pages = Seq.fill(60) {
      (1 to 1 + rng.nextInt(6)).map { _ =>
        val words = (1 to rng.nextInt(12)).map(_ => "w" + rng.nextInt(100)).mkString(" ")
        if (rng.nextBoolean()) s"<p>$words</p>" else s"<a href=/x>$words</a> tail"
      }.mkString("\n")
    }
    val rows = pages.toDF("h")
      .select(col("h"), graft.ops.Cleaning.mainContent(col("h")).as("m"))
      .collect()
    rows.foreach { r =>
      val strippedLines = r.getString(0).split("\n").toSeq
        .map(l => l.replaceAll("<[^>]*>", "").trim)
      val kept = r.getString(1).split("\n").toSeq.filter(_.nonEmpty)
      // order-preserving subsequence check
      var i = 0
      kept.foreach { k =>
        val j = strippedLines.indexOf(k, i)
        assert(j >= 0, s"kept line not found in order: $k")
        i = j + 1
      }
    }
  }
}
