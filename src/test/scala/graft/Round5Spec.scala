package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Round-5 operators: the iterative BPE merge loop + encoder. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // --- BPE merge training -------------------------------------------------

  test("bpeTrain learns the classic merges with exact weighted counts") {
    // the Sennrich et al. worked example: low×2, lower×1, newest×3, widest×1
    // pair counts round 1: (e,s)=4 and (s,t)=4 tie → lexicographic → (e,s);
    // round 2: (es,t)=4 wins.
    val docs = Seq("low low newest newest", "newest widest lower").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 2).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "e", "s", 4L), (2, "es", "t", 4L)))
  }

  test("bpe merge application is greedy left-to-right, non-overlapping") {
    val syms = Seq("aaa").toDF("w")
      .select(TextAnalysis.bpeEncode(col("w"), Seq(("a", "a"))).as("syms"))
      .head().getSeq[String](0)
    assert(syms == Seq("aa", "a"), "rule (a,a) on 'aaa' must consume left-first")
  }

  test("bpeEncode replays learned merges; 1-char words survive the loop") {
    val enc = Seq("newest").toDF("w")
      .select(TextAnalysis.bpeEncode(col("w"), Seq(("e", "s"), ("es", "t"))).as("syms"))
      .head().getSeq[String](0)
    assert(enc == Seq("n", "e", "w", "est"))
    // a corpus of only 1-char words has zero pairs: training must stop
    // cleanly (empty merge table), not crash on sequence(0, -2)
    val m = TextAnalysis.bpeTrain(Seq("a b a b").toDF("text"), col("text"), nMerges = 3)
    assert(m.count() == 0)
  }

  // --- JPEG SOF dimension walk --------------------------------------------

  test("imageDims JPEG: SOF behind variable segments; SOS/garbage fail to null") {
    def dims(hex: String) = Seq(hex).toDF("hx")
      .withColumn("payload", unhex(col("hx")))
      .select(graft.ops.Multimodal.imageDims(col("payload")).as("d"))
      .select(col("d.format"), col("d.width"), col("d.height"))
      .head()
    // SOI + APP0(JFIF) + COM("AB") + SOF0 320x240 (0x0140 x 0x00F0)
    val good = "FFD8" + "FFE000104A46494600010100000100010000" +
      "FFFE00044142" + "FFC0001108" + "00F0" + "0140" + "03011100021100031100"
    assert(dims(good) ==  org.apache.spark.sql.Row("jpeg", 320, 240))
    // SOS before any SOF: dims must be null, format still jpeg
    val sos = "FFD8" + "FFDA000C03011100021100031100003F00"
    assert(dims(sos) == org.apache.spark.sql.Row("jpeg", null, null))
    // truncated stream (marker walk runs off the payload): null dims
    assert(dims("FFD8FFE0") == org.apache.spark.sql.Row("jpeg", null, null))
    // non-marker byte where a marker should be: null dims
    assert(dims("FFD8" + "0041") == org.apache.spark.sql.Row("jpeg", null, null))
  }

  // --- 64-bit SimHash -----------------------------------------------------

  test("simHash64Duplicates pairs identical docs at hamming 0 and enforces its range") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "utterly different content with other words entirely now")).toDF("id", "text")
    val pairs = graft.ops.Dedup.simHash64Duplicates(docs, col("id"), col("text")).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L, 0L)))
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.simHash64Duplicates(docs, col("id"), col("text"), bits = 32)
    }
    intercept[IllegalArgumentException] {
      // 64 bits / 7 quarters doesn't divide evenly
      graft.ops.Dedup.simHash64Duplicates(docs, col("id"), col("text"), maxHamming = 6)
    }
  }

  test("simhash_bits64 reads digest bits, not hex-char top bits") {
    // md5("x") = 9dd4e461268c8034f5c8564e155c67a6 → first hex char '9' =
    // 1001: positions 1-4 must be exactly "1001" with a single vote
    graft.functions.GraftFunctions.register(spark)
    val sig = Seq("x").toDF("t")
      .select(expr("simhash_bits64(array(md5(t)), 8)").as("sig"))
      .head().getString(0)
    assert(sig == "10011101", s"expected bit pattern of 0x9d, got $sig")
  }

  // --- CDC + incremental dedup composition ----------------------------------

  test("CDC digests dedupe across document versions where fixed-size chunking cannot") {
    // v2 = v1 with an inserted prefix: fixed-size windows all shift, but
    // content-defined chunks re-align after the first boundary — the whole
    // reason CDC exists as a dedup primitive
    val body = (1 to 200).map(i => s"sentence$i piece").mkString(" ")
    val docs = Seq((1L, body), (2L, "NEW INTRO PARAGRAPH ADDED IN V2 " + body)).toDF("id", "text")
    val ch = graft.ops.Chunking.cdcChunks(docs, col("id"), col("text"), w = 16, divisor = 64)
    val v1 = ch.filter(col("doc_id") === 1).select(col("digest")).distinct()
    val v2 = ch.filter(col("doc_id") === 2).select(col("digest")).distinct()
    val shared = v1.join(v2, Seq("digest")).count()
    val v1n = v1.count()
    assert(shared >= v1n / 2,
      s"most of v1's chunk digests must survive the prefix edit (shared $shared of $v1n)")
    // the fixed-size control: same width, boundaries at fixed offsets —
    // the prefix shift misaligns every window
    def fixed(t: String) = t.grouped(64).map(c => java.security.MessageDigest
      .getInstance("MD5").digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString).toSet
    val fixedShared = fixed(body).intersect(fixed("NEW INTRO PARAGRAPH ADDED IN V2 " + body)).size
    assert(fixedShared <= 1, s"fixed-size chunking should share ~nothing after the shift, got $fixedShared")
  }

  // --- DSIR importance resampling -------------------------------------------

  test("importanceResample weights target-like docs above target-disjoint ones") {
    val target = Seq((100L, "spark streaming shuffle join optimizer catalyst")).toDF("id", "text")
    val raw = Seq(
      (1L, "spark streaming join catalyst shuffle"), // shares the target vocabulary
      (2L, "gardening tulips watering compost soil")) // disjoint
      .toDF("id", "text")
    val out = graft.ops.Curation.importanceResample(raw, target, col("id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) > out(2L),
      s"target-overlapping doc must out-weigh the disjoint one: $out")
    // rerun-stable: the Gumbel uniforms are md5-derived, not rand()
    val again = graft.ops.Curation.importanceResample(raw, target, col("id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(again == out)
  }

  // --- OCR preprocessing ----------------------------------------------------

  test("Ocr: luma, box denoise, Otsu, binarize are hand-exact") {
    import graft.ops.Ocr
    val rgb = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte)
    assert(Ocr.grayscale(rgb).map(_ & 0xff).toSeq == Seq(76, 149, 29))
    val img = Array(10, 10, 10, 10, 100, 10, 10, 10, 10).map(_.toByte)
    val den = Ocr.boxDenoise3(img, 3, 3).map(_ & 0xff)
    assert(den(4) == 20, "center = mean of all 9")
    assert(den(0) == 32, "corner = mean of its 4 existing neighbors")
    val bimodal = (Array.fill(50)(40) ++ Array.fill(50)(200)).map(_.toByte)
    val t = Ocr.otsuThreshold(bimodal)
    assert(t >= 40 && t < 200, s"threshold $t must split the modes")
    val bin = Ocr.binarize(bimodal, t).map(_ & 0xff)
    assert(bin.count(_ == 255) == 50 && bin.count(_ == 0) == 50)
    assert(Ocr.otsuThreshold(Array.fill(10)(7.toByte)) == -1, "constant image has no split")
  }

  test("Ocr stage output matches the relational ocr1 threshold on the fixture") {
    import graft.ops.Ocr
    val rel = graft.queries.MiscQueries.ocr1Otsu.fn(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 3).orderBy("doc_id").collect()
    assert(rel.nonEmpty)
    rel.foreach { r =>
      val docId = r.getLong(0)
      val n = (400 + (docId % 7) * 30).toInt
      val px = Array.tabulate(n) { i =>
        val base = if ((i.toLong * 7 + docId) % 10 < 6) 30L else 190L
        val v = (299 * (base + i % 11) + 587 * (base + (i.toLong * 2) % 13) +
          114 * (base + (i.toLong * 3) % 7)) / 1000
        v.toByte
      }
      assert(Ocr.otsuThreshold(px).toLong == r.getLong(1),
        s"doc $docId: JVM Otsu disagrees with the relational gate")
    }
  }

  // --- PDF text extraction --------------------------------------------------

  test("Pdf.extractText reads a hand-written uncompressed PDF (ground truth)") {
    // hand-authored bytes, NOT via buildMinimalPdf — the parser must read
    // a document it did not produce
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n" +
      "2 0 obj << /Length 61 >> stream\n" +
      "BT /F1 10 Tf 10 10 Td (Hello \\(PDF\\) world) Tj (, part 2) ' ET\n" +
      "endstream endobj\n%%EOF\n").getBytes("ISO-8859-1")
    assert(graft.ops.Pdf.extractText(pdf) == "Hello (PDF) world, part 2")
  }

  test("Pdf extraction: flate round-trip, TJ arrays, octal escapes, garbage safety") {
    import graft.ops.Pdf
    assert(Pdf.extractText(Pdf.buildMinimalPdf("plain flate text", compress = true))
      == "plain flate text")
    assert(Pdf.extractText(Pdf.buildMinimalPdf("split across a TJ array", compress = true,
      splitShow = true)) == "split across a TJ array")
    // octal escape \101 = 'A' inside a raw stream
    val octal = ("%PDF-1.4\n1 0 obj << /Length 20 >> stream\n" +
      "BT (oct\\101l) Tj ET\nendstream endobj\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(octal) == "octAl")
    // not a PDF at all / truncated stream: empty, never a throw
    assert(Pdf.extractText("DEADBEEF".getBytes) == "")
    assert(Pdf.extractText(("%PDF-1.4\n1 0 obj << /Filter /FlateDecode /Length 5 >> stream\n" +
      "ZZZZZ").getBytes("ISO-8859-1")) == "")
  }

  // --- PDF-to-retrieval composition -----------------------------------------

  test("the S1 front door composes: PDF bytes -> extract -> ingest -> retrieval") {
    // real flate-compressed PDFs carrying the corpus text, pushed through
    // the SAME pipeline the flagship runs on pre-extracted text
    val docs = graft.tables.TestTables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"),
        lit(true).as("compress"), lit(false).as("split"))
      .limit(50)
    val pdfs = graft.ops.Pdf.buildStage(docs, "t", "compress", "split", "payload")
      .select("doc_id", "payload")
    val extracted = graft.ops.Pdf.extractStage(pdfs, "payload", "text")
      .select(col("doc_id"), col("text"))
    // extraction must be lossless for the text layer
    val roundTrip = extracted.join(
        docs.select(col("doc_id"), col("t")), Seq("doc_id"))
      .filter(col("text") =!= col("t")).count()
    assert(roundTrip == 0, "PDF round-trip must preserve the text layer byte-for-byte")
    // and the recovered text drives the standard ingest + ask lifecycle
    val chunks = graft.pipeline.IngestPipeline.run(
        graft.pipeline.IngestPipeline.blocksFromFrame(extracted))
      .withColumn("uid", concat_ws("#", col("doc_id"), col("chunk_id")))
    val hits = graft.query.Ask.ask(chunks, "uid", "content", "spark join stream",
      graft.query.Ask.AskConfig(topK = 5))
    assert(hits.count() > 0, "retrieval over PDF-extracted text must return hits")
  }

  // --- Count-Min sketch -----------------------------------------------------

  test("CMS estimates are one-sided: est >= exact, exact when collision-free") {
    val out = graft.queries.TextQueries.sk1CmsHeavyHitters
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS must never under-count: ${r.getString(0)} est=${r.getLong(2)} exact=${r.getLong(1)}")
    }
    // a 3-token vocab cannot collide in any of the 4 rows of 256 buckets
    // unless md5 is adversarial — estimates must be EXACT, not merely >=
    import graft.ops.TextAnalysis
    val cnt = Seq("aa bb cc aa bb aa").toDF("text")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ev = cnt.select(col("w"), col("cnt"), explode(sequence(lit(0), lit(3))).as("r"))
      .withColumn("dig", md5(concat(col("r").cast("string"), lit(":"), col("w")).cast("binary")))
      .withColumn("bucket", conv(substring(col("dig"), 31, 2), 16, 10).cast("long"))
    val sketch = ev.groupBy("r", "bucket").agg(sum("cnt").as("c"))
    val est = ev.join(sketch, Seq("r", "bucket"))
      .groupBy("w", "cnt").agg(min("c").as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(est == Seq(("aa", 3L, 3L), ("bb", 2L, 2L), ("cc", 1L, 1L)),
      s"collision-free vocab must estimate exactly, got $est")
  }

  // --- Content-defined chunking -------------------------------------------

  test("cdc chunking reconstructs the text and is edit-stable under a prefix edit") {
    val text = (1 to 150).map(i => s"word$i token").mkString(" ")
    val docs = Seq((1L, text), (2L, "EDITED PREFIX CHANGES EVERYTHING EARLY " + text))
      .toDF("id", "text")
    val ch = graft.ops.Chunking.cdcChunks(docs, col("id"), col("text"), w = 16, divisor = 64)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = ch.filter(_.getLong(0) == 1L)
    val d2 = ch.filter(_.getLong(0) == 2L)
    // chunks partition the text exactly
    assert(d1.map(_.getLong(2)).sum == text.length)
    assert(d1.length > 3, s"fixture must cut several chunks, got ${d1.length}")
    // THE CDC property: an edit near the start must not re-cut the tail —
    // the last chunks' digests survive byte-identical
    val tail1 = d1.map(_.getString(3)).takeRight(2).toSeq
    val tail2 = d2.map(_.getString(3)).takeRight(2).toSeq
    assert(tail1 == tail2, "prefix edit re-cut the tail — boundaries are not content-defined")
    // empty and NULL text yield no chunks
    val empty = graft.ops.Chunking.cdcChunks(
      Seq((3L, ""), (4L, null: String)).toDF("id", "text"), col("id"), col("text"), 16, 64)
    assert(empty.count() == 0)
  }

  // --- Bloom-prefiltered decontamination ----------------------------------

  test("decontaminateBloom is bit-identical to the exact path") {
    val train = Seq(
      (1L, "alpha beta gamma delta shared phrase lives here today"),
      (2L, "totally clean document nothing shared with eval rows"),
      (3L, "another shared phrase lives here too for overlap")).toDF("id", "text")
    val eval_ = Seq((10L, "the shared phrase lives here marker")).toDF("id", "text")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, String, String, Int) => org.apache.spark.sql.DataFrame) =
      f(train, eval_, "id", "text", 4).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = run(graft.ops.Dedup.decontaminate)
    val bloom = run(graft.ops.Dedup.decontaminateBloom(_, _, _, _, _))
    assert(exact.nonEmpty, "fixture must actually share grams")
    assert(bloom == exact)
  }

  test("bpeTrain ignores non-alphabetic tokens and weights by frequency") {
    // "ab" appears 3×, "cd" 2×, "a1b!" filtered out entirely
    val docs = Seq("ab ab ab cd", "cd a1b!").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq(("a", "b", 3L)))
  }

  // --- Gopher rule battery ------------------------------------------------

  test("gopherRules computes every rule statistic hand-exactly") {
    // 4 non-empty lines: 2 bullets (50%), 1 ellipsis end (25%);
    // words: 8 total, 'x7' and '9' and '•' among them
    val text = "• alpha beta gamma\n- delta ...\n\nepsilon x7 9\nzeta"
    val r = Seq(text).toDF("t")
      .select(TextAnalysis.gopherRules(col("t"), minWords = 5, minStopHits = 0).as("g"))
      .select("g.*").head()
    // tokens: •,alpha,beta,gamma,-,delta,...,epsilon,x7,9,zeta
    assert(r.getAs[Long]("n_words") == 11)
    assert(r.getAs[Double]("alpha_word_frac") == 7.0 / 11.0)
    assert(r.getAs[Double]("bullet_line_frac") == 0.5)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.25)
    assert(r.getAs[Long]("n_stop_hits") == 0)
  }

  test("gopherRules keep verdict composes the published thresholds") {
    val good = ("the data and the pipeline have results that scale with " +
      "careful design of every stage ") * 5 // ~80 words, stopword-rich
    val shout = "#### #### #### #### #### #### #### #### #### ####"
    val rows = Seq((1L, good), (2L, shout), (3L, "tiny doc")).toDF("id", "t")
      .select(col("id"), TextAnalysis.gopherRules(col("t")).as("g"))
      .select(col("id"), col("g.keep").as("keep"), col("g.n_words").as("n_words"),
        col("g.symbol_ratio").as("sym"), col("g.alpha_word_frac").as("alpha"))
      .orderBy("id").collect()
    assert(rows(0).getBoolean(1), s"well-formed prose must pass: ${rows(0)}")
    assert(!rows(1).getBoolean(1) && rows(1).getDouble(3) > 0.1, "symbol wall must fail")
    assert(!rows(2).getBoolean(1), "a 2-word doc must fail the word-count band")
  }

  // --- ExactSubstr duplicated-substring spans ------------------------------

  test("dupSubstringSpans merges overlapping marked grams into ONE maximal span") {
    // docs 1 and 2 share a 12-token run at different alignments; with w=8
    // that run yields 5 overlapping marked grams per doc, which must merge
    // back into a single 12-token span — not report as 5 spans
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared u1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, s"v1 v2 v3 v4 v5 v6 v7 v8 $shared"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("id", "t")
    val r = TextAnalysis.dupSubstringSpans(docs, col("id"), col("t"), 8)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq((1L, 20L, 1L, 12L), (2L, 20L, 1L, 12L), (3L, 10L, 0L, 0L)),
      s"got $r")
  }

  test("dupSubstringSpans separates runs more than w apart; adjacency merges") {
    // doc 4 repeats doc 5's two 8-gram blocks with 9 unique tokens between
    // them → two separate spans of 8; back-to-back duplicated grams
    // (distance exactly w) must merge
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val gap = (1 to 9).map(i => s"g$i").mkString(" ")
    val df = Seq((4L, s"$a $gap $b"), (5L, s"$a x1 x2 x3 x4 x5 x6 x7 x8 x9 $b")).toDF("id", "t")
    val r = TextAnalysis.dupSubstringSpans(df, col("id"), col("t"), 8)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq((4L, 2L, 16L), (5L, 2L, 16L)), s"got $r")
  }

  // --- unigram-LM Viterbi segmentation --------------------------------------

  test("viterbiSegment beats greedy longest-match and backtracks the true argmax") {
    // p: a=.3, b=.05, aa=.05, ab=.6 — greedy longest-first on "aab" takes
    // aa+b (ln .05 + ln .05 ≈ -5.99); the optimum is a+ab (≈ -1.71)
    val vocab = Seq("a" -> 0.3, "b" -> 0.05, "aa" -> 0.05, "ab" -> 0.6)
      .map { case (p, v) => (p, math.log(v)) }.toDF("piece", "logp")
    val r = TextAnalysis.viterbiSegment(Seq("aab").toDF("word"), vocab).head()
    assert(r.getSeq[String](1) == Seq("a", "ab"), s"got ${r.getSeq[String](1)}")
    assert(r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - (math.log(0.3) + math.log(0.6))) < 1e-12)
  }

  test("viterbiSegment breaks exact score ties toward the longest piece") {
    // logp(ab) == logp(a) + logp(b) exactly: [ab] and [a, b] tie — the
    // deterministic rule picks the single longest piece
    val vocab = Seq(("a", -1.0), ("b", -2.0), ("ab", -3.0)).toDF("piece", "logp")
    val r = TextAnalysis.viterbiSegment(Seq("ab").toDF("word"), vocab).head()
    assert(r.getSeq[String](1) == Seq("ab"))
    assert(r.getDouble(3) == -3.0)
  }

  test("unigramPieceVocab keeps every single char and the lexicographic top-k ties") {
    val wcnt = Seq(("ab", 3L), ("ba", 1L)).toDF("word", "wc")
    // grams: a=4, b=4 (singles always kept); ab=3, ba=1 multi → k=1 keeps ab
    val v = TextAnalysis.unigramPieceVocab(wcnt, k = 1, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(v.keySet == Set("a", "b", "ab"))
    // tot = 4+4+3 = 11
    assert(math.abs(v("ab") - math.log(3.0 / 11)) < 1e-12)
  }

  // --- PCA power iteration -------------------------------------------------

  test("Pca recovers the hand-computable principal direction and eigenvalue") {
    // points on the line y = x: covariance [[1.25,1.25],[1.25,1.25]],
    // top eigenvector (1/√2, 1/√2), eigenvalue 2.5 — power iteration
    // from e1 lands on it in one step
    val emb = Seq(0f, 1f, 2f, 3f).zipWithIndex
      .map { case (v, i) => (i.toLong, Seq(v, v)) }.toDF("vec_id", "embedding")
    val cov = graft.index.Pca.covariance(emb, "vec_id", "embedding", 2)
    val cm = cov.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cm.values.forall(v => math.abs(v - 1.25) < 1e-9), s"cov: $cm")
    val v = graft.index.Pca.powerIteration(cov, 2, 3)
      .orderBy("i").collect().map(_.getDouble(1))
    assert(v.forall(x => math.abs(x - math.sqrt(0.5)) < 1e-9), s"v: ${v.toSeq}")
    val lam = graft.index.Pca.matvec(cov, graft.index.Pca.powerIteration(cov, 2, 3))
      .join(graft.index.Pca.powerIteration(cov, 2, 3), "i")
      .agg(sum(col("v") * col("w"))).head().getDouble(0)
    assert(math.abs(lam - 2.5) < 1e-9, s"lambda: $lam")
  }

  // --- Retrieval fusion -----------------------------------------------------

  test("rrf fuses two rankings with 1/(k0+rank) and keeps single-list docs") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val out = graft.index.Fusion.rrf(a, b, "id", "rank", k0 = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(out(1L) - 1.0 / 61) < 1e-15)          // only list a
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15) // both
    assert(math.abs(out(3L) - 1.0 / 62) < 1e-15)          // only list b
  }

  test("mmr picks the diverse candidate over the redundant higher-rel one") {
    // a=(1,0) rel 1.0; b=(2,0) rel 0.9 (sim(a,b)=1); c=(0,1) rel 0.5
    // (sim to both = 0). Step 1: a (0.7). Step 2: b scores .63-.3=.33,
    // c scores .35 -> c. Step 3: b (.33).
    val cands = Seq(
      (1L, 1.0, Seq(1.0f, 0.0f)),
      (2L, 0.9, Seq(2.0f, 0.0f)),
      (3L, 0.5, Seq(0.0f, 1.0f))).toDF("id", "rel", "vec")
    val out = graft.index.Fusion.mmr(cands, "id", "rel", "vec", k = 3, lambda = 0.7)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L), s"order: ${out.toSeq}")
    assert(math.abs(out(0)._3 - 0.7) < 1e-9)
    assert(math.abs(out(1)._3 - 0.35) < 1e-9)
    assert(math.abs(out(2)._3 - 0.33) < 1e-9)
  }

  // --- Z-order layout -------------------------------------------------------

  test("zValue interleaves bits (hand cases) and layout shrinks bounding boxes") {
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(graft.ops.ZOrder.zValue(col("x"), col("y"), 4)).head().getLong(0)
    // x=0101 -> even bits 1,0,1,0 at 0,2,4,6 = 0b00010001? x bit i -> pos 2i:
    // x=5 (101): pos0=1,pos4=1 -> 17; y=3 (11): pos1=1,pos3=1 -> 10; z=27
    assert(z == 27L, s"z=$z")
    // 32x32 grid: z-order into 16 slices must give ~square per-slice boxes,
    // far smaller on y-range than a linear sort by x (which leaves y 0..31)
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    // the win is the SECOND dimension's per-slice range: a linear sort by x
    // clusters x perfectly but leaves every slice spanning all of y (range
    // 32); z-order makes slices ~square (y-range 8) — that's what lets a
    // y-predicate prune files at all
    def avgYRange(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("y") - min("y") + 1).as("yr"))
        .agg(avg("yr")).head().getDouble(0)
    val zY = avgYRange(graft.ops.ZOrder.layout(grid, col("x"), col("y"), 5, 16))
    val linY = avgYRange(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(zY <= linY / 2, s"z-order avg y-range $zY not < half of linear $linY")
  }

  // --- Weighted sampling ----------------------------------------------------

  test("weightedSample is deterministic and weight-monotone in expectation") {
    val rows = (0L until 400L).map(i => (i, if (i < 200) 1.0 else 20.0)).toDF("id", "w")
    val s1 = graft.ops.TextAnalysis.weightedSample(rows, col("id"), col("w"), 100)
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = graft.ops.TextAnalysis.weightedSample(rows, col("id"), col("w"), 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)                           // seedless determinism
    assert(s1.size == 100)
    val heavy = s1.count(_ >= 200)
    assert(heavy > 75, s"only $heavy of 100 picks from the 20x-weight half")
  }

  // --- Logistic-regression GD -----------------------------------------------

  test("logregTrain takes the hand-computable first GD step and separates") {
    // balanced ±1 feature, y = (x > 0): after 1 iter from w=0 all p=0.5,
    // so g0 = 0 and g1 = mean((0.5-y)x) = -0.5 -> w1 = 0.25 exactly
    val rows = Seq((1.0, 1.0), (-1.0, 0.0), (1.0, 1.0), (-1.0, 0.0)).toDF("x", "y")
    val w1 = graft.ops.Classifier.logregTrain(rows, Seq(col("x")), col("y"), iters = 1)
      .orderBy("feature_idx").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(w1(0) == 0.0 && w1(1) == 0.25, s"weights: $w1")
    // more iterations keep growing the separating weight; accuracy 4/4
    val w5 = graft.ops.Classifier.logregTrain(rows, Seq(col("x")), col("y"), iters = 5)
    val wMap = w5.orderBy("feature_idx").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(wMap(1) > 0.25 && math.abs(wMap(0)) < 1e-9, s"weights: $wMap")
    val acc = graft.ops.Classifier.accuracy(rows, Seq(col("x")), col("y"), w5).head()
    assert(acc.getLong(0) == 4L && acc.getLong(1) == 4L)
  }

  // --- BLEU-2 ---------------------------------------------------------------

  test("bleu2 matches the hand-computed clipped precisions and BP") {
    // ref: the cat sat on the mat; cand: the cat the cat on
    // p1 = (min(2,2)+min(2,1)+min(1,1))/5 = 4/5; p2 = 1/4 ("the cat" clipped
    // to 1); c=5 < r=6 -> BP = exp(-0.2); bleu = exp(-0.2)*sqrt(0.2)
    val df = Seq((1L, Seq("the", "cat", "sat", "on", "the", "mat"),
      Seq("the", "cat", "the", "cat", "on"))).toDF("id", "ref", "cand")
    val r = graft.eval.Eval.bleu2(df, "id", "ref", "cand").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((4L, 5L, 1L, 4L)))
    val expected = math.exp(-0.2) * math.sqrt(0.8 * 0.25)
    assert(math.abs(r.getDouble(5) - expected) < 1e-6, s"bleu=${r.getDouble(5)}")
    // identical cand -> perfect score 1.0
    val perfect = graft.eval.Eval.bleu2(
      Seq((1L, Seq("a", "b", "c"), Seq("a", "b", "c"))).toDF("id", "ref", "cand"),
      "id", "ref", "cand").head().getDouble(5)
    assert(perfect == 1.0)
    // no bigram overlap -> 0.0
    val zero = graft.eval.Eval.bleu2(
      Seq((1L, Seq("a", "b"), Seq("b", "a"))).toDF("id", "ref", "cand"),
      "id", "ref", "cand").head().getDouble(5)
    assert(zero == 0.0)
  }

  // --- SCD2 -----------------------------------------------------------------

  test("scd2 suppresses no-change versions and chains intervals") {
    val hist = Seq(
      (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"),   // t=20 is a no-change
      (2L, 10L, "X")).toDF("k", "ts", "v")
    val out = graft.ops.TableOps.scd2(hist, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, 30L, false),   // closed by the REAL change at 30, not 20
      (1L, "B", 30L, -1L, true),
      (2L, "X", 10L, -1L, true)))
  }

  // --- WARC parse -----------------------------------------------------------

  test("warc parse is payload-spoof-proof and flags truncated records") {
    // payload contains a fake "Content-Length: 999" line — must NOT win
    val rec = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 26\r\n\r\n" +
      "Content-Length: 999\r\nbody!"
    val r = Seq(rec).toDF("rec").select(graft.ops.Warc.parse(col("rec")).as("w"))
      .select("w.*").head()
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[Long]("declared_len") == 26L)
    assert(r.getAs[Long]("actual_len") == 26L && r.getAs[Boolean]("len_ok"))
    // truncated fetch: declared 100, actual 5
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\nabcde"
    val rb = Seq(bad).toDF("rec").select(graft.ops.Warc.parse(col("rec")).as("w"))
      .select("w.*").head()
    assert(rb.getAs[Long]("actual_len") == 5L && !rb.getAs[Boolean]("len_ok"))
    // multibyte payload: Content-Length declares OCTETS (ISO 28500 §5.3) —
    // "héllo" is 5 chars / 6 UTF-8 bytes; a char count would mis-flag it.
    val mb = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 6\r\n\r\nhéllo"
    val rm = Seq(mb).toDF("rec").select(graft.ops.Warc.parse(col("rec")).as("w"))
      .select("w.*").head()
    assert(rm.getAs[Long]("actual_len") == 6L && rm.getAs[Boolean]("len_ok"))
  }

  test("scd2 opens a new interval when an attribute changes to or from NULL") {
    val hist = Seq(
      (1L, 10L, Option("A")), (1L, 20L, None), (1L, 30L, Option("A")),
      (2L, 10L, None), (2L, 20L, None)).toDF("k", "ts", "v")
    val out = graft.ops.TableOps.scd2(hist, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, Some("A"), 10L, 20L, false),   // A -> NULL is a REAL change
      (1L, None, 20L, 30L, false),        // NULL -> A is a REAL change
      (1L, Some("A"), 30L, -1L, true),
      (2L, None, 10L, -1L, true)))        // NULL -> NULL is a no-change
  }

  // --- OLS fit / KL divergence ---------------------------------------------

  test("olsFit recovers an exact noise-free line and r2 = 1") {
    val pts = Seq((1.0, 5.0), (2.0, 7.0), (3.0, 9.0), (4.0, 11.0)).toDF("x", "y")
    val r = graft.ops.Classifier.olsFit(pts, col("x"), col("y")).head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-9)   // slope
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)   // intercept
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)   // r2
    assert(r.getLong(3) == 4L)
  }

  test("klBySource gives identical groups identical KL, all nonnegative") {
    // the corpus is the blend of all groups, so every group that differs
    // from the blend carries positive KL; a and b are identical -> equal KL
    val docs = Seq(("a", "x y"), ("b", "x y"), ("c", "x x x y")).toDF("g", "text")
    val out = graft.ops.TextAnalysis.klBySource(docs, col("g"), col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a and b share the corpus-skewed-toward-x mix less than c does
    assert(out("a") == out("b"))
    assert(out.values.forall(_ >= 0.0), s"negative KL: $out")
    assert(out("a") > 0.0 && out("c") > 0.0)
  }

  // --- ROUGE-L --------------------------------------------------------------

  test("rougeL computes the hand LCS, survives rotation, handles empties") {
    val cases = Seq(
      (1L, Seq("a", "b", "c", "d", "e"), Seq("a", "x", "c", "e")),          // lcs 3
      (2L, Seq("a", "b", "c", "d", "e", "f"), Seq("d", "e", "f", "a", "b", "c")), // lcs 3
      (3L, Seq("a", "b"), Seq[String]()),                                   // empty cand
      (4L, Seq("a", "b"), Seq("x", "y"))).toDF("id", "ref", "cand")         // lcs 0
    val out = graft.eval.Eval.rougeL(cases, "id", "ref", "cand")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    assert(out(0)._2 == 3L)
    val f1 = 2.0 * (3.0 / 4) * (3.0 / 5) / (3.0 / 4 + 3.0 / 5)
    assert(math.abs(out(0)._3 - f1) < 1e-6, s"f1=${out(0)._3}")
    assert(out(1)._2 == 3L)    // rotation keeps a 3-token subsequence
    assert(out(2)._2 == 0L && out(2)._3 == 0.0)
    assert(out(3)._2 == 0L && out(3)._3 == 0.0)
  }

  // --- robots.txt -----------------------------------------------------------

  test("parseStarGroup extracts only the * group; decide applies RFC precedence") {
    val robots =
      "User-agent: googlebot\nDisallow: /\n\n" +
        "User-agent: *\nDisallow: /private # comment\nAllow: /private/open\n" +
        "Crawl-delay: 10\n\nUser-agent: other\nDisallow: /other"
    val rules = Seq(robots).toDF("txt")
      .select(explode(graft.ops.Robots.parseStarGroup(col("txt"))).as("r"))
      .select("r.*").collect().map(r => (r.getBoolean(0), r.getString(1))).toSeq
    assert(rules == Seq((false, "/private"), (true, "/private/open")),
      s"rules: $rules")   // googlebot/other groups and Crawl-delay skipped
    val urls = Seq(("h", "/private/x"), ("h", "/private/open/x"), ("h", "/free"))
      .toDF("host", "path")
    val ruleDf = rules.map { case (a, p) => ("h", a, p) }.toDF("host", "allow", "pattern")
    val out = graft.ops.Robots.decide(urls, ruleDf)
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(out == Map("/private/x" -> false, "/private/open/x" -> true, "/free" -> true))
  }

  // --- PPJoin prefix-filtered Jaccard ---------------------------------------

  test("prefixJaccardPairs equals brute-force exact Jaccard (no false negatives)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),    // near-dup of 1
      (3L, "one two three four five six"),
      (4L, "one two three four five seven"),         // near-dup of 3
      (5L, "totally different words here now then")).toDF("id", "text")
    val pp = graft.ops.Dedup.prefixJaccardPairs(docs, "id", "text", w = 3, threshold = 0.3)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // brute force over all 10 pairs
    val g = docs.select(col("id"), graft.ops.Dedup.wordShingles(col("text"), 3).as("g"))
    val brute = g.select(col("id").as("a"), col("g").as("ga"))
      .crossJoin(g.select(col("id").as("b"), col("g").as("gb")))
      .filter(col("a") < col("b"))
      .withColumn("j", size(array_intersect(col("ga"), col("gb"))).cast("double") /
        size(array_union(col("ga"), col("gb"))).cast("double"))
      .filter(col("j") >= 0.3)
      .select("a", "b")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pp == brute, s"pp=$pp brute=$brute")
    assert(pp == Seq((1L, 2L), (3L, 4L)))
  }

  // --- Dynamic BM25 / RM3 ---------------------------------------------------

  test("topKDynamic matches the static topK score for the same term set") {
    val docs = Seq(
      (1L, "spark joins data with spark shuffle"),
      (2L, "vector search with spark"),
      (3L, "unrelated words entirely here")).toDF("doc_id", "text")
    val terms = Seq("spark", "vector")
    val static = graft.index.Bm25.topK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val termsDf = Seq("spark", "vector").toDF("term")
    val dyn = graft.index.Bm25.topKDynamic(docs, "doc_id", "text", termsDf, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same docs retrieved; scores agree to the 6-dp rounding both apply
    assert(dyn.keySet == static.keySet)
    dyn.foreach { case (id, s) => assert(math.abs(s - static(id)) < 2e-6, s"$id: $s vs ${static(id)}") }
  }

  test("rm3ExpansionTerms excludes seeds and short tokens") {
    val docs = Seq(
      (1L, "spark spark distributed shuffle engine"),
      (2L, "spark distributed runtime it is")).toDF("doc_id", "text")
    val fb = Seq((1L, 2.0), (2L, 1.0)).toDF("doc_id", "bm25")
    val terms = graft.index.Bm25.rm3ExpansionTerms(docs, "doc_id", "text", fb,
      seeds = Seq("spark"), n = 10).collect().map(_.getString(0)).toSet
    assert(!terms.contains("spark"))            // seed excluded
    assert(!terms.contains("it") && !terms.contains("is"))  // < 4 chars
    assert(terms.contains("distributed") && terms.contains("shuffle"))
  }

  // --- TIFF IFD walk --------------------------------------------------------

  test("tiff dims decode under both endiannesses; garbage fails to null") {
    def dims(hexStr: String): Option[(String, Option[Int], Option[Int])] = {
      val r = Seq(hexStr).toDF("hx")
        .select(graft.ops.Multimodal.imageDims(unhex(col("hx"))).as("d"))
        .select("d.format", "d.width", "d.height").head()
      def oi(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
      if (r.isNullAt(0)) None else Some((r.getString(0), oi(1), oi(2)))
    }
    // little-endian: IFD at 8, 2 entries: 256 SHORT 320 (left-justified), 257 LONG 200
    val le = "49492A00" + "08000000" +
      "0200" + "0001" + "0300" + "01000000" + "40010000" +
      "0101" + "0400" + "01000000" + "C8000000" + "00000000"
    assert(dims(le).contains(("tiff", Some(320), Some(200))))
    // big-endian, same image
    val be = "4D4D002A" + "00000008" +
      "0002" + "0100" + "0003" + "00000001" + "01400000" +
      "0101" + "0004" + "00000001" + "000000C8" + "00000000"
    assert(dims(be).contains(("tiff", Some(320), Some(200))))
    // IFD offset pointing past the payload: dims must be null, never garbage
    assert(dims("49492A00FFFFFFFF").exists(t => t._2.isEmpty && t._3.isEmpty))
    assert(dims("DEADBEEF").isEmpty)
  }

  // --- Embedding outliers ---------------------------------------------------

  test("centroidOutliers flags the planted far point and nothing else") {
    // 9 points near the origin + one far outlier
    val vecs = (0L until 9L).map(i => (i, Seq(0.01f * i, 0.0f))) :+ (9L, Seq(50.0f, 50.0f))
    val df = vecs.toDF("id", "vec")
    val out = graft.ops.Cluster.centroidOutliers(df, "id", "vec", dim = 2, sigmas = 2.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(9L), "far point not flagged")
    assert((0L until 9L).forall(i => !out(i)), s"near points flagged: $out")
  }

  // --- Script profile -------------------------------------------------------

  test("scriptCounts counts per script class; dominant flips with the mix") {
    val scripts = Seq("n_latin" -> "[A-Za-z]", "n_cjk" -> "[一-鿿]",
      "n_cyrillic" -> "[Ѐ-ӿ]")
    val rows = Seq("abc 中文文文 x", "ыы", "").toDF("t")
      .select(graft.ops.TextAnalysis.scriptCounts(col("t"), scripts).as("c"))
      .select("c.*").collect()
    assert((rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2)) == ((4L, 4L, 0L)))
    assert((rows(1).getLong(0), rows(1).getLong(1), rows(1).getLong(2)) == ((0L, 0L, 2L)))
    assert((rows(2).getLong(0), rows(2).getLong(1), rows(2).getLong(2)) == ((0L, 0L, 0L)))
  }

  // --- WAV chunk walk -----------------------------------------------------

  test("wavMeta walks RIFF chunks incl. odd-size padding; fails to null, never garbage") {
    def hx(s: String) = s.replaceAll("\\s", "")
    def le32(v: Int) = f"$v%08X".grouped(2).toSeq.reverse.mkString
    def le16(v: Int) = f"$v%04X".grouped(2).toSeq.reverse.mkString
    val fmt = "666D7420" + le32(16) + le16(1) + le16(2) + le32(44100) +
      le32(44100 * 4) + le16(4) + le16(16)
    val cases = Seq(
      // fmt directly after WAVE
      "w1" -> hx(s"52494646 ${le32(100)} 57415645 $fmt"),
      // fmt behind an ODD 3-byte JUNK chunk (walk must add the pad byte)
      "w2" -> hx(s"52494646 ${le32(100)} 57415645 4A554E4B ${le32(3)} AABBCC 00 $fmt"),
      // RIFF/WAVE but no fmt within the payload → null fields
      "w3" -> hx(s"52494646 ${le32(100)} 57415645 4A554E4B ${le32(4)} AABBCCDD"),
      // not RIFF at all → null struct
      "w4" -> "DEADBEEF")
    val out = cases.toDF("id", "hx")
      .withColumn("payload", unhex(col("hx")))
      .withColumn("w", graft.ops.Multimodal.wavMeta(col("payload")))
      .select(col("id"), col("w.sample_rate"), col("w.channels"), col("w.bits"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getInt(3))))).toMap
    assert(out("w1").contains((44100, 2, 16)))
    assert(out("w2").contains((44100, 2, 16)), "odd-chunk pad byte must not derail the walk")
    assert(out("w3").isEmpty && out("w4").isEmpty)
  }

  // --- PageRank -----------------------------------------------------------

  test("pageRank matches the hand formula on a 3-node star; mass is conserved") {
    // symmetrized star: A↔B, A↔C. deg A=2, B=C=1. After one round:
    //   A = 0.15/3 + 0.85·(1/3 + 1/3)        (B and C each send their whole 1/3)
    //   B = C = 0.15/3 + 0.85·(1/3 / 2)      (A splits its 1/3 across two out-edges)
    val edges = Seq(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")).toDF("src", "dst")
    val r1 = graft.ops.Graph.pageRank(edges, 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val base = 1.0 - 0.85
    assert(math.abs(r1("A") - (base / 3 + 0.85 * (1.0 / 3 + 1.0 / 3))) < 1e-9)
    assert(math.abs(r1("B") - (base / 3 + 0.85 * (1.0 / 3 / 2))) < 1e-9)
    assert(r1("B") == r1("C"), "symmetric leaves must tie exactly")
    // symmetric graph, no dangling nodes: total mass stays 1 through rounds
    val r3 = graft.ops.Graph.pageRank(edges, 3).collect().map(_.getDouble(1)).sum
    assert(math.abs(r3 - 1.0) < 1e-9, s"mass leaked: $r3")
    // zero iterations = the uniform prior
    val r0 = graft.ops.Graph.pageRank(edges, 0).collect().map(_.getDouble(1)).toSeq
    assert(r0.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
  }

  // --- trigram events -----------------------------------------------------

  test("adjacentTokenTriples zip-shifts and guards short docs") {
    val r = Seq("a b c d", "a b", "").toDF("t")
      .select(TextAnalysis.adjacentTokenTriples(TextAnalysis.tokens(col("t"))).as("tr"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(
        x => (x.getString(0), x.getString(1), x.getString(2))).toSeq).toSeq
    assert(r(0) == Seq(("a", "b", "c"), ("b", "c", "d")))
    assert(r(1).isEmpty && r(2).isEmpty)
  }
}
