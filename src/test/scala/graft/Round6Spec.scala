package graft

import org.apache.spark.sql.functions._
import graft.ops.Pdf

/** Round-6 additions: the PDF text-POSITIONING state machine (Td, TD, Tm,
  * T*, TL, ', ", TJ) and the layout gate queries built on it. */
class Round6Spec extends SparkSpec {

  test("Pdf.extractBlocks decodes a hand-written positioned stream (ground truth)") {
    // Hand-authored, NOT via the builder: Td absolute, TD with leading
    // side effect, T* line advance, Tm replacement, ' inheritance.
    val content =
      "BT /F1 14 Tf 100 700 Td (line one) Tj " +
        "0 -20 TD (line two) Tj " +
        "T* (line three) Tj " +
        "/F2 9 Tf 2 0 0 2 300 650 Tm (scaled) Tj " +
        "(after scaled) ' ET"
    val pdf = ("%PDF-1.4\n4 0 obj << /Length " + content.length + " >> stream\n" +
      content + "\nendstream endobj\ntrailer\n%%EOF\n").getBytes("ISO-8859-1")
    val b = Pdf.extractBlocks(pdf)
    assert(b.map(_.text) == Seq("line one", "line two", "line three", "scaled", "after scaled"))
    assert(b(0) == Pdf.TextBlock("line one", 100, 700, 14))
    assert(b(1) == Pdf.TextBlock("line two", 100, 680, 14))  // TD moved and set leading=20
    assert(b(2) == Pdf.TextBlock("line three", 100, 660, 14)) // T* reuses leading
    // Tm with scale 2: effective size = 9 * hypot(0, 2) = 18
    assert(b(3) == Pdf.TextBlock("scaled", 300, 650, 18))
    // ': line matrix is the SCALED Tm, so (0,-20) maps through it: y = 650 - 2*20
    assert(b(4) == Pdf.TextBlock("after scaled", 300, 610, 18))
  }

  test("Pdf.extractBlocks merges consecutive shows into one line; flushes on moves") {
    val content = "BT /F1 10 Tf 10 10 Td (a) Tj ( b) Tj [( c) -120 ( d)] TJ 0 5 Td (next) Tj ET"
    val pdf = ("x stream\n" + content + "\nendstream").getBytes("ISO-8859-1")
    val b = Pdf.extractBlocks(pdf)
    assert(b.map(_.text) == Seq("a b c d", "next"))
    assert(b(1).x == 10.0 && b(1).y == 15.0)
  }

  test("Pdf.extractBlocks tokenizer: balanced parens, hex strings, dicts, comments") {
    val content = "BT /F1 10 Tf 5 5 Td % a comment\n" +
      "(nested (parens) survive) Tj <48692E> Tj " +
      "/Tag << /K (not text) >> BDC (after dict) Tj ET"
    val pdf = ("x stream\n" + content + "\nendstream").getBytes("ISO-8859-1")
    val b = Pdf.extractBlocks(pdf)
    assert(b.map(_.text) == Seq("nested (parens) surviveHi.after dict"))
  }

  test("Pdf.extractBlocks never throws on garbage") {
    assert(Pdf.extractBlocks("not a pdf".getBytes) == Seq.empty)
    assert(Pdf.extractBlocks(Array[Byte]()) == Seq.empty)
    // no endstream → the stream is skipped (same contract as extractText)
    val truncated = "x stream\nBT /F1 10 Tf 5 5 Td (unclosed".getBytes("ISO-8859-1")
    assert(Pdf.extractBlocks(truncated) == Seq.empty)
  }

  test("Pdf.buildLayoutPdf round-trips through extractBlocks with derived footer") {
    for (compress <- Seq(false, true)) {
      val pdf = Pdf.buildLayoutPdf(
        ("Heading 7", 72, 720, 18), ("Body 7 alpha beta", 74, 700, 10),
        ("Aside 7 right", 90, 526, 11), "Footer 7", compress)
      val b = Pdf.extractBlocks(pdf)
      assert(b.size == 4, s"compress=$compress: $b")
      assert(b(0) == Pdf.TextBlock("Heading 7", 72, 720, 18))
      assert(b(1) == Pdf.TextBlock("Body 7 alpha beta", 74, 700, 10))
      assert(b(2) == Pdf.TextBlock("Aside 7 right", 90, 526, 11))
      // derived: x from block 2, y = y2 - (y0 - y1), size inherited from block 2
      assert(b(3) == Pdf.TextBlock("Footer 7", 90, 506, 11))
    }
  }

  test("pdf2/pdf3/pdf4 run end-to-end on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val blocks = graft.queries.PdfQueries.pdf2LayoutBlocks.fn(spark, d).collect()
    assert(blocks.length % 4 == 0 && blocks.nonEmpty)
    val doc0 = blocks.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
    assert(doc0.map(_.getString(2)).toSeq ==
      Seq("Heading 0", "Body 0 alpha beta", "Aside 0 right", "Footer 0"))
    assert(doc0(3).getDouble(3) == 306.0 && doc0(3).getDouble(4) == 710.0)

    val order = graft.queries.PdfQueries.pdf3ReadingOrder.fn(spark, d).collect()
    // doc 3: odd (left column) and %3==0 (Tm block at 730, above heading)
    val d3 = order.find(_.getLong(0) == 3L).get.getString(1)
    assert(d3 == "Aside 3 right | Heading 3 | Footer 3 | Body 3 alpha beta")
    // doc 1: odd, aside at y=521 → natural top-down order
    val d1 = order.find(_.getLong(0) == 1L).get.getString(1)
    assert(d1 == "Heading 1 | Body 1 alpha beta | Aside 1 right | Footer 1")

    val hb = graft.queries.PdfQueries.pdf4HeadingBand.fn(spark, d).collect()
    val hb0 = hb.filter(_.getLong(0) == 0L)
    assert(hb0.length == 3) // block 2 at y=730 is out of band for doc 0 (%3==0)
    assert(hb0.count(_.getBoolean(3)) == 1 && hb0.find(_.getBoolean(3)).get.getInt(1) == 0)
  }

  test("Warc gzip member round-trips; truncation and garbage fail to None") {
    import graft.ops.Warc
    val rec = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n\r\nhello"
    val member = Warc.gzipMember(rec.getBytes("UTF-8"))
    assert(new String(Warc.gunzipMember(member).get, "UTF-8") == rec)
    // multibyte payloads survive the UTF-8 round trip
    val thai = "หัวข้อ ภาษาไทย — payload"
    assert(new String(Warc.gunzipMember(Warc.gzipMember(thai.getBytes("UTF-8"))).get, "UTF-8") == thai)
    // a cut trailer (truncated fetch) must FAIL, not return a prefix
    assert(Warc.gunzipMember(member.dropRight(1)).isEmpty)
    assert(Warc.gunzipMember(member.take(member.length / 2)).isEmpty)
    // garbage bytes and the empty member fail closed too
    assert(Warc.gunzipMember("not gzip at all".getBytes).isEmpty)
    assert(Warc.gunzipMember(Array[Byte]()).isEmpty)
    // zip-bomb guard: decompressed size past maxBytes → None, no OOM
    val bomb = Warc.gzipMember(Array.fill[Byte](1 << 16)(65))
    assert(Warc.gunzipMember(bomb, maxBytes = 1 << 10).isEmpty)
    assert(Warc.gunzipMember(bomb, maxBytes = 1 << 20).get.length == (1 << 16))
  }

  test("Warc.splitMembers walks concatenated gzip framing; corruption quarantines the blob") {
    import graft.ops.Warc
    val recs = (1 to 5).map(i => s"record $i payload ${"x" * (i * 7)}")
    val blob = recs.flatMap(r => Warc.gzipMember(r.getBytes("UTF-8"))).toArray
    assert(Warc.splitMembers(blob).get.map(new String(_, "UTF-8")) == recs)
    // a truncated tail member fails the WHOLE blob (strict quarantine)
    assert(Warc.splitMembers(blob.dropRight(1)).isEmpty)
    // a flipped byte mid-blob: deflate error, CRC mismatch, or broken
    // header — every path must land on None, never a wrong record
    val bad = blob.clone(); bad(blob.length / 2) = (bad(blob.length / 2) ^ 0x01).toByte
    assert(Warc.splitMembers(bad).isEmpty)
    // hand-framed member with FLG.FNAME set: header extensions skipped
    val content = "named member".getBytes("UTF-8")
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(content); d.finish()
    val buf = new Array[Byte](256); val n = d.deflate(buf); d.end()
    val crc = new java.util.zip.CRC32(); crc.update(content)
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val named = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 0) ++
      "file.warc\u0000".getBytes("ISO-8859-1") ++ java.util.Arrays.copyOf(buf, n) ++
      le32(crc.getValue) ++ le32(content.length.toLong)
    assert(Warc.splitMembers(named ++ Warc.gzipMember("tail".getBytes("UTF-8"))).get
      .map(new String(_, "UTF-8")) == Seq("named member", "tail"))
    assert(Warc.splitMembers(Array[Byte]()).get.isEmpty)
    assert(Warc.splitMembers("junk".getBytes).isEmpty)
    // decompressed-size cap: strict None, not partial output
    assert(Warc.splitMembers(Warc.gzipMember(Array.fill[Byte](4096)(66)), maxBytes = 1024).isEmpty)
  }

  test("warc2_gzip_records: corrupt members null out, intact members parse") {
    val rows = graft.queries.MiscQueries.warc2Gzip.fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val (bad, good) = rows.partition(_.getLong(0) % 13 == 0)
    assert(bad.nonEmpty && bad.forall(r => !r.getBoolean(1) && r.isNullAt(2) && r.isNullAt(7)))
    assert(good.forall(_.getBoolean(1)))
    // the %11 Content-Length overstatement still surfaces through the member
    assert(good.filter(_.getLong(0) % 11 == 0).forall(!_.getBoolean(7)))
    assert(good.filter(r => r.getLong(0) % 11 != 0).forall(_.getBoolean(7)))
  }

  test("ImageDimsExpr matches the Column imageDims bit-for-bit on fixtures + adversarial sweeps") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val samples: Seq[Array[Byte]] = Seq(
      // png 789×680
      hx("89504E470D0A1A0A0000000D49484452 00000315 000002A8 08060000"),
      // gif89a 789×680 LE, gif87a 1×1
      hx("474946383961 1503 A802 F70000"),
      hx("474946383761 0100 0100 80"),
      // jpeg: SOI, APP0, COM(5), SOF0 680×789
      hx("FFD8 FFE000104A46494600010100000100010000 FFFE0005414141 FFC00011 08 02A8 0315 03011100021100031100"),
      // jpeg that hits EOI before any SOF; jpeg with a non-marker byte
      hx("FFD8 FFE00004 4141 FFD9"),
      hx("FFD8 00"),
      // tiff LE: IFD@8, 2 entries (width SHORT 789, height LONG 680)
      hx("49492A00 08000000 0200 0001 0300 01000000 15030000 0101 0400 01000000 A8020000 00000000"),
      // tiff BE: same shape
      hx("4D4D002A 00000008 0002 0100 0003 00000001 03150000 0101 0004 00000001 000002A8 00000000"),
      // tiff with hostile IFD offset (overflow guard) and bad magic
      hx("49492A00 FFFFFFFF"),
      hx("49494242"),
      // bmp BITMAPINFOHEADER 789×680, top-down (negative height), OS/2 core 789×680
      hx("424D46000000 00000000 36000000 28000000 15030000 A8020000 0100"),
      hx("424D46000000 00000000 36000000 28000000 15030000 58FDFFFF 0100"),
      hx("424D1E000000 00000000 1A000000 0C000000 1503 A802 0100 0100"),
      // bmp with an unrecognized DIB size must stay null
      hx("424D1E000000 00000000 1A000000 1B000000 1503 A802"),
      // wav/garbage/empty
      hx("52494646 64000000 57415645 666D7420"),
      hx("DEADBEEF"),
      Array[Byte]())
    val rng = new scala.util.Random(7)
    val garbage = Seq.fill(60)(Array.fill[Byte](rng.nextInt(48))(rng.nextInt(256).toByte))
    // every truncation prefix of every sample: the partial-read semantics
    // (available-bytes parse vs null) are where the two forms could drift
    val prefixes = samples.flatMap(b => (0 to b.length).map(b.take))
    val corpus = (samples ++ prefixes ++ garbage).zipWithIndex.map { case (b, i) => (i, b) }
    val out = corpus.toDF("id", "payload")
      .select(col("id"),
        graft.ops.Multimodal.imageDims(col("payload")).as("spec"),
        graft.ops.Multimodal.imageDimsNative(col("payload")).as("native"))
      .collect()
    assert(out.length == corpus.length)
    out.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"id=${r.get(0)}: spec=${r.get(1)} native=${r.get(2)} " +
          s"payload=${corpus(r.getInt(0))._2.map("%02X".format(_)).mkString}")
    }
    // sanity on the planted values (both forms, not just equal-but-wrong)
    val byId = out.map(r => r.getInt(0) -> r.getStruct(1)).toMap
    assert(byId(0) != null && byId(0).getString(0) == "png" &&
      byId(0).getInt(1) == 789 && byId(0).getInt(2) == 680)
    assert(byId(3).getString(0) == "jpeg" && byId(3).getInt(1) == 789 && byId(3).getInt(2) == 680)
    assert(byId(6).getInt(1) == 789 && byId(7).getInt(2) == 680)
    assert(byId(11).getString(0) == "bmp" && byId(11).getInt(2) == 680) // |−680| top-down
    assert(byId(12).getInt(1) == 789 && byId(12).getInt(2) == 680)     // OS/2 core
  }

  test("Pii.luhnValid/luhnCheckDigit agree with known card checksums") {
    import spark.implicits._
    // 4539578763621486 is a textbook-valid Luhn number; +1 breaks it
    val rows = Seq("4539578763621486", "4539578763621487", "79927398713", "79927398710")
      .toDF("card")
      .select(col("card"), graft.ops.Pii.luhnValid(col("card")).as("ok"),
        graft.ops.Pii.luhnCheckDigit(expr("substring(card, 1, length(card) - 1)")).as("chk"))
      .collect()
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(true, false, true, false))
    // the generator must reproduce the valid numbers' own check digits
    assert(rows(0).getInt(2) == 6 && rows(2).getInt(2) == 3)
    // candidate extraction: 20-digit runs yield NO 19-digit prefix; short runs drop
    val cands = Seq("pay 4539578763621486 ref 123 id 12345678901234567890 x")
      .toDF("t").select(graft.ops.Pii.cardCandidates(col("t"))).first().getSeq[String](0)
    assert(cands == Seq("4539578763621486"))
  }

  test("Cleaning.mainContent keeps dense text, drops nav/short/link-heavy lines") {
    import spark.implicits._
    val html = Seq(
      "<div><a href=/>Home</a> <a href=/b>Blog</a></div>",          // link-dense nav
      "<p>This paragraph is long enough to keep around here.</p>",  // keep
      "<p>tiny</p>",                                                // short
      "Sidebar <a href=/x>with one long anchor text inside it that dominates</a>", // density kill
      "A plain unmarked line that is also long enough to survive.").mkString("\n")
    val out = Seq(html).toDF("h")
      .select(graft.ops.Cleaning.mainContent(col("h")).as("m")).first().getString(0)
    assert(out == "This paragraph is long enough to keep around here.\n" +
      "A plain unmarked line that is also long enough to survive.")
    // empty page → empty string, not null
    val empty = Seq("<div><a href=/>x</a></div>").toDF("h")
      .select(graft.ops.Cleaning.mainContent(col("h"))).first().getString(0)
    assert(empty == "")
  }

  test("TableOps.mergeAdditive equals a single-pass aggregate; avg-of-avgs would not") {
    import spark.implicits._
    val rows = Seq(("a", 10L), ("a", 20L), ("a", 60L), ("b", 5L), ("b", 7L))
      .toDF("k", "v").withColumn("one", lit(1L))
    def part(f: org.apache.spark.sql.DataFrame) =
      f.groupBy("k").agg(sum("one").as("n"), sum("v").as("s"))
    // lopsided split: batch 1 holds two 'a' rows, batch 2 the third —
    // avg-of-avgs for 'a' would give (15 + 60)/2 = 37.5, truth is 30
    val merged = graft.ops.TableOps.mergeAdditive(
        Seq(part(rows.limit(2)), part(rows.offset(2))), Seq("k"), Seq("n", "s"))
      .select(col("k"), (col("s").cast("double") / col("n")).as("avg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged("a") == 30.0 && merged("b") == 6.0)
  }

  test("x14b approx buckets: cuts within sketch error bound of exact deciles") {
    val d = "/root/testdata/sf0.01"
    val exact = graft.queries.MiscQueries.x14QualityBuckets.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = graft.queries.MiscQueries.x14bApproxBuckets.fn(spark, d).collect()
    assert(approx.length == exact.size)
    // accuracy 10000 ⇒ rank error ≤ N/10000 < 1 row at sf0.01 — but the
    // sketch may still place a cut on the far side of a tied/adjacent
    // value, so the contract is: every doc within one decile of exact,
    // and ≥99% agree exactly
    val drift = approx.map(r => math.abs(r.getLong(2) - exact(r.getLong(0))))
    assert(drift.max <= 1, s"decile drift > 1: ${drift.max}")
    assert(drift.count(_ == 0) >= (approx.length * 99) / 100)
  }

  test("TextAnalysis.compressionStage: repetition compresses, edges null out, reruns agree") {
    import spark.implicits._
    val rep = "lorem ipsum dolor " * 60
    val varied = (1 to 180).map(i => s"w${i * 7919 % 997}x${i * 104729 % 991}").mkString(" ")
    val df = Seq((1L, rep), (2L, varied), (3L, ""), (4L, null: String)).toDF("id", "t")
    val out = graft.ops.TextAnalysis.compressionStage(df, "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    // long-range repetition compresses far below varied text
    assert(out(1L).getDouble(4) < 0.1)
    assert(out(2L).getDouble(4) > out(1L).getDouble(4) * 3)
    // ratio stays in a sane band; raw_len counts UTF-8 octets
    assert(out(2L).getDouble(4) <= 1.2 && out(2L).getLong(2) == varied.length.toLong)
    // empty → (0, null, null); null text → all null
    assert(out(3L).getLong(2) == 0L && out(3L).isNullAt(3) && out(3L).isNullAt(4))
    assert(out(4L).isNullAt(2) && out(4L).isNullAt(4))
    // deterministic across evaluations
    val again = graft.ops.TextAnalysis.compressionStage(df, "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(again(1L).getDouble(4) == out(1L).getDouble(4)
      && again(2L).getLong(3) == out(2L).getLong(3))
  }

  test("Preference.bradleyTerry: two-item fixed point matches hand MM algebra") {
    import spark.implicits._
    // A beats B twice, B beats A once: W=(2,1), n_AB=3, p0=(.5,.5) →
    // den=3/1=3, praw=(2.5/3, 1.5/3), normalize → (0.625, 0.375) — a
    // fixed point, so 3 iterations land exactly there
    val m = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("winner", "loser")
    val out = graft.ops.Preference.bradleyTerry(m).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") == ((2L, 3L, 0.625)))
    assert(out("B") == ((1L, 3L, 0.375)))
    // winless item: the half-win prior keeps strength finite positive
    val oneSided = Seq(("A", "B")).toDF("winner", "loser")
    val o = graft.ops.Preference.bradleyTerry(oneSided).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(o("A") == 0.75 && o("B") == 0.25)
  }

  test("p17 sentence chunks: budget respected, no sentence split, chunks contiguous") {
    val d = "/root/testdata/sf0.01"
    val chunks = graft.queries.TextQueries.p17SentenceChunks.fn(spark, d).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val (nSent, nWords) = (r.getLong(2), r.getLong(3))
      // a chunk exceeds the 40-word budget ONLY as a single oversized
      // sentence (the never-split-a-sentence contract)
      assert(nWords <= 40 || nSent == 1L, s"over-budget multi-sentence chunk: $r")
      assert(nSent >= 1L)
    }
    // chunk ids are contiguous per doc; they open at 0 (first sentence
    // fits) or 1 (first sentence alone over budget) — the w4 contract
    chunks.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head <= 1L && ids.toSeq == (ids.head to ids.last).toSeq)
    }
    // and every p16 sentence is assigned to exactly one chunk
    val nSentTotal = graft.queries.TextQueries.p16SentenceSplit.fn(spark, d).count()
    assert(chunks.map(_.getLong(2)).sum == nSentTotal)
  }

  test("ev6 token F1: multiset overlap credits repeats at min frequency") {
    import spark.implicits._
    // pred = [a a b], gold = [a b b c]: overlap = min(2,1)+min(1,2) = 2;
    // P = 2/3, R = 2/4, F1 = 2PR/(P+R) = 4/7
    val pred = Seq("a", "a", "b"); val gold = Seq("a", "b", "b", "c")
    val df = Seq((pred, gold)).toDF("pred", "gold")
    val ov = coalesce(aggregate(array_distinct(col("pred")), lit(0),
      (acc, tk) => acc + least(
        size(filter(col("pred"), x => x === tk)),
        size(filter(col("gold"), x => x === tk)))), lit(0))
    assert(df.select(ov).first().getInt(0) == 2)
  }

  test("Dedup.containmentPairs: strict subset always found; disjoint never") {
    import spark.implicits._
    // B holds 12 distinctive tokens; A is B's first 6 (strict shingle
    // subset); C is disjoint. Probe blocking CANNOT miss A⊆B: A's
    // rarest shingle is by definition one of B's.
    val b = (1 to 12).map(i => s"tk$i").mkString(" ")
    val a = (1 to 6).map(i => s"tk$i").mkString(" ")
    val c = (1 to 8).map(i => s"zz$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val out = graft.ops.Dedup.containmentPairs(df, "id", "text",
      w = 3, probeK = 3, indexDfCap = 200, threshold = 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // A has 4 shingles, all inside B's 10 → cont(A in B) = 1.0
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 0.4)
  }

  test("x28 novelty: an exact-dup doc scores 0.0, the corpus-first doc 1.0") {
    val d = "/root/testdata/sf0.01"
    val rows = graft.queries.TextQueries.x28NgramNovelty.fn(spark, d).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(0L) == 1.0) // nothing precedes doc 0
    // every doc is in (0, 1] no-NaN, and at least one later doc repeats
    // enough earlier content to fall below 0.5 (the planted near-dups)
    assert(rows.forall(r => r.getDouble(3) > 0.0 - 1e-9 && r.getDouble(3) <= 1.0))
    assert(rows.exists(r => r.getLong(0) > 0 && r.getDouble(3) < 0.5))
  }

  test("TextAnalysis.fleschStats: hand-counted sentences, words, syllables") {
    import spark.implicits._
    // "the cat sat. it ran fast! done?" → 3 sentences, 7 words;
    // syllables (vowel-group runs, floor 1): the=1 cat=1 sat=1 it=1
    // ran=1 fast=1 done=2 → 8
    val r = Seq("the cat sat. it ran fast! done?").toDF("t")
      .select(graft.ops.TextAnalysis.fleschStats(col("t")).as("s"))
      .select("s.n_sentences", "s.n_words", "s.n_syllables", "s.flesch").first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 7L, 8L)))
    val expected = BigDecimal(206.835 - 1.015 * (7.0 / 3.0) - 84.6 * (8.0 / 7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expected)
    // no terminators → sentence floor 1; empty text → zero words, flesch defined
    val bare = Seq("just words no stops").toDF("t")
      .select(graft.ops.TextAnalysis.fleschStats(col("t")).as("s")).select("s.n_sentences").first()
    assert(bare.getLong(0) == 1L)
    val empty = Seq("").toDF("t")
      .select(graft.ops.TextAnalysis.fleschStats(col("t")).as("s"))
      .select("s.n_words", "s.n_syllables").first()
    assert((empty.getLong(0), empty.getLong(1)) == ((0L, 0L)))
  }

  test("TextAnalysis.distinctN: hand-counted unigram/bigram diversity") {
    import spark.implicits._
    // "a b a b" → 4 unigrams 2 unique (d1=0.5); bigrams: "a b","b a","a b"
    // → 3 total 2 unique (d2=0.666667)
    val r = Seq("a b a b").toDF("t")
      .select(graft.ops.TextAnalysis.distinctN(col("t")).as("d"))
      .select("d.n_unigrams", "d.d1", "d.n_bigrams", "d.d2").first()
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.5)
    assert(r.getLong(2) == 3L && r.getDouble(3) == 0.666667)
    // single token: no bigrams → d2 NULL, not 0 (absence is a fact)
    val one = Seq("solo").toDF("t")
      .select(graft.ops.TextAnalysis.distinctN(col("t")).as("d"))
      .select("d.n_bigrams", "d.d2").first()
    assert(one.getLong(0) == 0L && one.isNullAt(1))
  }
}
