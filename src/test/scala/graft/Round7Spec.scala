package graft

import graft.functions.Mp4Meta

/** Round-7 additions: the MP4/ISO-BMFF box walk. Fixtures here are
  * hand-authored byte-by-byte (NOT via the m8 query's hex builder) so the
  * spec and the oracle fixture can't share a common bug. */
class Round7Spec extends SparkSpec {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(typ: String, content: Array[Byte]): Array[Byte] =
    be32(content.length + 8L) ++ fourcc(typ) ++ content

  private def mvhdV0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(ts) ++ be32(dur) ++ Array.fill[Byte](80)(0))

  private def mvhdV1(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(ts) ++ be64(dur) ++ Array.fill[Byte](80)(0))

  private val ftyp = box("ftyp", fourcc("isom") ++ be32(0))

  test("Mp4Meta: metadata-first v0 layout") {
    val moov = box("moov", mvhdV0(1000, 7500) ++ box("trak", Array[Byte]()) ++ box("trak", Array[Byte]()))
    val mp4 = ftyp ++ moov ++ box("mdat", Array[Byte](1, 2, 3))
    val r = Mp4Meta.meta(mp4)
    assert(r.getInt(0) == 1000 && r.getLong(1) == 7500L && r.getInt(2) == 2)
  }

  test("Mp4Meta: metadata-at-end layout hops mdat and free by declared size") {
    val moov = box("moov", mvhdV1(90000, 1234567890123L) ++ box("trak", Array[Byte]()))
    val mp4 = ftyp ++ box("free", Array.fill[Byte](13)(0x41)) ++
      box("mdat", Array.fill[Byte](100)(0x42)) ++ moov
    val r = Mp4Meta.meta(mp4)
    assert(r.getInt(0) == 90000 && r.getLong(1) == 1234567890123L && r.getInt(2) == 1)
  }

  test("Mp4Meta: 64-bit largesize mdat before moov") {
    val content = Array.fill[Byte](9)(0x55)
    val largeMdat = be32(1) ++ fourcc("mdat") ++ be64(16L + content.length) ++ content
    val mp4 = ftyp ++ largeMdat ++ box("moov", mvhdV0(600, 42))
    val r = Mp4Meta.meta(mp4)
    assert(r.getInt(0) == 600 && r.getLong(1) == 42L && r.getInt(2) == 0)
  }

  test("Mp4Meta: size==0 (to-EOF) moov as last box") {
    val moovContent = mvhdV0(48000, 96000) ++ box("trak", Array[Byte]())
    val mp4 = ftyp ++ (be32(0) ++ fourcc("moov") ++ moovContent)
    val r = Mp4Meta.meta(mp4)
    assert(r.getInt(0) == 48000 && r.getLong(1) == 96000L && r.getInt(2) == 1)
  }

  test("Mp4Meta: fail-to-null — garbage, wrong magic, no mvhd, bad version") {
    assert(Mp4Meta.meta(null) == null)
    assert(Mp4Meta.meta(Array[Byte](1, 2, 3)) == null)
    assert(Mp4Meta.meta("not an mp4 at all............".getBytes) == null)
    // valid leader but moov has no mvhd
    assert(Mp4Meta.meta(ftyp ++ box("moov", box("trak", Array[Byte]()))) == null)
    // mvhd version 2 is unknown
    val badVer = box("mvhd", Array[Byte](2, 0, 0, 0) ++ Array.fill[Byte](100)(0))
    assert(Mp4Meta.meta(ftyp ++ box("moov", badVer)) == null)
    // child box overrunning its moov parent
    val overrun = be32(9999) ++ fourcc("trak")
    assert(Mp4Meta.meta(ftyp ++ box("moov", mvhdV0(1, 1) ++ overrun)) == null)
    // malformed size in 2..7
    assert(Mp4Meta.meta(ftyp ++ be32(5) ++ fourcc("moov")) == null)
  }

  test("Mp4Meta: truncation sweep never throws — null or the full answer") {
    val moov = box("moov", mvhdV1(1000, 99999) ++ box("trak", Array[Byte]()))
    val full = ftyp ++ box("free", Array.fill[Byte](7)(0)) ++ moov ++ box("mdat", Array.fill[Byte](5)(1))
    for (n <- 0 to full.length) {
      val r = Mp4Meta.meta(full.take(n)) // must not throw
      if (r != null) assert(r.getInt(0) == 1000 && r.getLong(1) == 99999L)
    }
  }

  test("Mp4Meta: seeded random-byte fuzz never throws") {
    val rnd = new scala.util.Random(20260814)
    for (_ <- 1 to 300) {
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      Mp4Meta.meta(b) // null or a parse — never a throw
      // and with a valid leader grafted on, the walk still can't escape
      if (b.length >= 8) {
        System.arraycopy(be32(b.length), 0, b, 0, 4)
        System.arraycopy(fourcc("ftyp"), 0, b, 4, 4)
        Mp4Meta.meta(b)
      }
    }
  }

  test("Mp4Meta: hostile size chain is hop-bounded") {
    // 20 tiny boxes then moov — beyond the 16-hop budget → null, no spin
    val filler = (1 to 20).map(_ => box("free", Array[Byte]())).reduce(_ ++ _)
    val mp4 = ftyp ++ filler ++ box("moov", mvhdV0(10, 10))
    assert(Mp4Meta.meta(mp4) == null)
    // and within budget it is found
    val small = ftyp ++ box("free", Array[Byte]()) ++ box("moov", mvhdV0(10, 10))
    assert(Mp4Meta.meta(small).getInt(0) == 10)
  }

  test("Lid: learns separable char distributions and ties break to earliest lang") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Lid
    // two "languages" with disjoint alphabets — separable by bigram buckets
    val rows = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "aa", "aaaa bbbb aaab baba abab " * 4)
      // NOTE 'y'≡'a', 'z'≡'b' (mod 8) — a y/z alphabet would hash to
      // IDENTICAL features at B=8 (found the hard way); e/f has distinct
      // residues from a/b
      else (i.toLong, "zz", "eeee ffff eeef fefe efef " * 4)
    }
    val df = rows.toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), Lid.bigramBuckets(col("text"), 8).as("bs"))
    val feats = Lid.bucketFeatures(col("bs"), 8)
    // 20 iters: at 5 the mirror-symmetric models are still underfit and
    // the aa-model scores zz docs marginally positive (measured)
    val wts = Lid.trainOneVsRest(df, feats, col("lang"), Seq("aa", "zz"), iters = 20)
    val out = Lid.classify(df, Seq(col("doc_id"), col("lang")), feats, wts)
    assert(out.filter(col("pred_lang") === col("lang")).count() == 40) // fully separable
    // tie-break: identical scores (untrained weights = all zeros → p = 0.5
    // everywhere) must pick the alphabetically-first language deterministically
    val zero = spark.range(3).select(
      explode(sequence(lit(0), lit(8))).as("feature_idx")).distinct()
      .select(col("feature_idx").cast("int"), lit(0.0).as("weight"))
    val tied = Lid.classify(df, Seq(col("doc_id")), feats, Seq("mm" -> zero, "aa" -> zero))
    assert(tied.select("pred_lang").distinct().collect().map(_.getString(0)).toSeq == Seq("mm"))
  }

  test("Lid.bigramBuckets: short/empty docs yield empty arrays, prefix bounds cost") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Lid
    val df = Seq("", "a", "ab", "x" * 10000).toDF("text")
      .select(size(Lid.bigramBuckets(col("text"), 8, prefixChars = 256)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 1, 255))
  }

  test("Hll: merge of arbitrary splits is register-identical; error within 3 sigma") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Hll
    for (n <- Seq(100, 2000, 20000)) {
      // 3-way split by a hash unrelated to the item value
      val df = spark.range(n).select(lit("k").as("g"),
        (abs(hash(col("id"))) % 3).as("b"), concat(lit("item-"), col("id")).as("w"))
      val whole = Hll.registers(df, Seq("g"), col("w"))
      val merged = Hll.merge(Hll.registers(df, Seq("g", "b"), col("w")), Seq("g"))
      assert(whole.select("g", "bucket", "rho").except(merged.select("g", "bucket", "rho")).isEmpty
        && merged.select("g", "bucket", "rho").except(whole.select("g", "bucket", "rho")).isEmpty,
        s"n=$n: merged registers must equal whole-stream registers exactly")
      val est = Hll.estimate(whole, Seq("g")).head().getDouble(1)
      val sigma = 1.04 / math.sqrt(Hll.m) // standard HLL relative error
      assert(math.abs(est - n) / n <= 3 * sigma,
        s"n=$n: estimate $est outside 3 sigma (${3 * sigma * 100}%)")
    }
  }

  test("Classifier.logregTrainMulti: bit-identical weights to per-head logregTrain") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Classifier
    val df = (0 until 60).map(i =>
      (i.toLong, (i % 3).toString, i * 0.017, (i % 7) * 0.31, math.sin(i) + 1.0))
      .toDF("id", "cls", "f_a", "f_b", "f_c").localCheckpoint()
    val feats = Seq(col("f_a"), col("f_b"), col("f_c"))
    val heads = Seq("0", "1", "2").map(c => c -> when(col("cls") === c, 1.0).otherwise(0.0))
    val multi = Classifier.logregTrainMulti(df, feats, heads, iters = 4)
    for ((name, y) <- heads) {
      val single = Classifier.logregTrain(df, feats, y, iters = 4)
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
      val batched = multi.find(_._1 == name).get._2
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
      assert(batched == single, s"head $name drifted: $batched vs $single")
    }
  }

  test("Curation.budgetAllocation: caps never violated, budget conserved on skew") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one giant domain + tiny ones: sqrt temperature up-weights the tiny
    // domains far past any sane epoch cap, so redistribution must fire
    val rows = (0 until 400).map(i => (i.toLong, "big", Seq.fill(50)("w").mkString(" "))) ++
      (0 until 10).map(i => (1000L + i, s"tiny$i", "w w w"))
    val df = rows.toDF("doc_id", "source", "text")
    val out = graft.ops.Curation.budgetAllocation(df, col("source"), col("text"),
      budgetFactor = 1.2, maxEpochs = 3.0, rounds = 5).collect()
    val byDom = out.map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    for ((dom, tokens, target, epochs, _) <- byDom) {
      assert(epochs <= 3.0 + 1e-9, s"$dom epochs $epochs violates cap")
      assert(target <= tokens * 3.0 + 1e-6, s"$dom target $target violates cap")
    }
    // every tiny domain wants >> 3 epochs under sqrt temperature → capped;
    // overflow lands on the big domain
    assert(byDom.filter(_._1 != "big").forall(_._5), "tiny domains must cap")
    val total = byDom.map(_._2).sum.toDouble
    val alloc = byDom.map(_._3).sum
    assert(alloc <= 1.2 * total + 1e-6)
    // budget is fully allocatable here (big domain stays far below ITS cap)
    assert(math.abs(alloc - 1.2 * total) < 1.0, s"alloc $alloc vs budget ${1.2 * total}")
  }

  test("AcAutomaton: matches the position-scan definition on adversarial fixtures") {
    import graft.functions.AcAutomaton
    import org.apache.spark.unsafe.types.UTF8String
    def brute(s: String, pats: Seq[String]): Seq[Int] =
      pats.map(p => (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)))
    def ac(s: String, pats: Seq[String]): Seq[Int] = {
      val a = new AcAutomaton(pats.toArray)
      val r = a.counts(UTF8String.fromString(s))
      (0 until r.numElements()).map(r.getInt)
    }
    val cases = Seq(
      ("aaaa", Seq("aa", "a", "aaa")),                       // self-overlap
      ("sparkpark parka", Seq("spark", "park", "ark", "ar")), // nested suffix chain
      ("ababab", Seq("aba", "bab", "ab", "ba")),             // interleaved overlap
      ("streams dream team", Seq("str", "stream", "ream", "eam", "m")),
      ("xyz", Seq("spark", "park")),                          // zero hits
      ("tt", Seq("t", "tt", "ttt")),                          // prefix chain + absent
      ("mississippi", Seq("issi", "ssi", "ss", "i", "pp", "mississippi")))
    for ((s, pats) <- cases)
      assert(ac(s, pats) == brute(s, pats), s"text='$s' pats=$pats")
    // duplicate patterns each count independently
    assert(ac("abab", Seq("ab", "ab")) == Seq(2, 2))
    // pseudo-random sweep: alphabet {a,b,c}, every pattern up to len 3
    val pats3 = for (l <- 1 to 3; t <- Seq.fill(l)("abc").flatten.combinations(l); p <- t.permutations) yield p.mkString
    val dict = pats3.distinct.toSeq
    var seed = 12345L
    for (_ <- 1 to 20) {
      val sb = new StringBuilder
      for (_ <- 1 to 50) { seed = seed * 6364136223846793005L + 1442695040888963407L; sb.append(("abc")(((seed >>> 33) % 3).toInt)) }
      val s = sb.toString
      assert(ac(s, dict) == brute(s, dict), s"random text '$s'")
    }
  }

  test("ac_counts expression: codegen path, null text, and non-foldable rejection") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("sparkpark"), None, Some("")).toDF("t")
      .select(call_function("ac_counts", col("t"), array(lit("spark"), lit("park"), lit("ark"))).as("c"))
    val got = df.collect().map(r =>
      Option(r.get(0)).map(_.asInstanceOf[scala.collection.Seq[Int]].toSeq))
    assert(got(0) == Some(Seq(1, 2, 2)))
    assert(got(1).isEmpty)
    assert(got(2) == Some(Seq(0, 0, 0)))
    // non-foldable pattern array must be rejected at analysis, not per row
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", Seq("a"))).toDF("t", "p")
        .select(call_function("ac_counts", col("t"), col("p"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("mp4_meta expression: codegen and interpreted paths agree over the fixture family") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val moovA = box("moov", mvhdV0(1000, 7500) ++ box("trak", Array[Byte]()))
    val moovB = box("moov", mvhdV1(90000, 1L << 40) ++ box("trak", Array[Byte]()) ++ box("trak", Array[Byte]()))
    val rows = Seq(
      ftyp ++ moovA,
      ftyp ++ box("mdat", Array.fill[Byte](50)(9)) ++ moovB,
      "garbage".getBytes,
      Array[Byte]()
    ).map(b => Tuple1(b))
    val df = rows.toDF("payload")
      .withColumn("m", graft.ops.Multimodal.mp4Meta(col("payload")))
      .select("m.timescale", "m.duration", "m.n_tracks")
    val got = df.collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    assert(got(0) == ((Some(1000), Some(7500L), Some(1))))
    assert(got(1) == ((Some(90000), Some(1L << 40), Some(2))))
    assert(got(2) == ((None, None, None)))
    assert(got(3) == ((None, None, None)))
  }

  test("tok6 WordPiece greedy: longest-first, UNK-on-any-failure, 16-char cap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val start = Seq("spark", "stream", "join", "data", "the", "th",
      "pro", "con", "re", "ing") ++ ('a' to 'z').map(_.toString)
    val cont = Seq("ing", "tion", "ream", "ed", "er", "es", "s") ++
      ('a' to 'z').map(_.toString)
    val cases = Seq(
      "sparking" -> ((2, 0)), // spark + ##ing — longest start piece wins over s/sp
      "thes" -> ((2, 0)),     // the + ##s — 'the'(3) beats 'th'(2): longest-first
      "data" -> ((1, 0)),
      "aaaa" -> ((4, 0)),     // single-char fallback path
      "a.b" -> ((1, 1)),      // '.' has no piece → whole word is one [UNK]
      "ééé" -> ((1, 1)),      // out-of-vocab alphabet → [UNK]
      "abcdefghijklmnopq" -> ((1, 1))) // 17 chars: over the cap → [UNK]
    val got = cases.map(_._1).toDF("word")
      .select(col("word"),
        graft.ops.TextAnalysis.wordPieceStats(col("word"), start, cont).as("r"))
      .select(col("word"), col("r.n_pieces"), col("r.n_unk"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    cases.foreach { case (w, expect) => assert(got(w) == expect, s"$w: ${got(w)}") }
  }

  test("LateInteraction: identical tokens score 1, cousins graded, disjoint low") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "spark runs fast"), (2L, "sparkly things"), (3L, "qqqq zzzz")).toDF("doc_id", "text")
    val top = graft.index.LateInteraction.maxSimTopK(docs, "doc_id", "text", Seq("spark"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(top(1L) == 1.0) // exact token present → cos 1
    assert(top(2L) > 0.8 && top(2L) < 1.0) // morphological cousin graded
    assert(top(3L) < 0.5, s"disjoint alphabet scored ${top(3L)}")
  }

  test("Pii.ibanValid: canonical published IBANs pass, any single-char bump fails") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the ISO 13616 / ECBS published examples — ground truth independent
    // of our own check-digit generator
    val good = Seq("DE89370400440532013000", "GB82WEST12345698765432",
      "FR1420041010050500013M02606", "NO9386011117947")
    val bad = good.map(s => s.updated(8, (((s(8) - '0') + 1) % 10 + '0').toChar)) ++
      Seq("DE00370400440532013000")
    val got = (good ++ bad).toDF("iban")
      .select(graft.ops.Pii.ibanValid(col("iban")).as("v")).collect().map(_.getBoolean(0))
    assert(got.take(good.length).forall(identity), "all published examples must validate")
    assert(got.drop(good.length).forall(!_), "corrupted digits must fail")
    // and the fixture generator round-trips: computed check digits validate
    val cc = Seq(("DE", "370400440532013000")).toDF("ctry", "bban")
      .select(graft.ops.Pii.ibanCheckDigits(col("ctry"), col("bban")).as("cc"))
      .collect().head.getString(0)
    assert(cc == "89") // matches the published DE example
  }

  test("Cleaning.confusableSkeleton: homoglyphs fold, zero-width strips, table is sane") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val C = graft.ops.Cleaning.Confusables
    // translate table must stay aligned: every from-char except the
    // zero-width tail has exactly one target
    assert(C.from.length == C.to.length + C.zeroWidth.length)
    assert(C.letterFrom.length == C.letterTo.length)
    val rows = Seq(
      "раypаl login",            // Cyrillic р/а spoof of "paypal login"
      "paypal login",
      "ＰＡＹＰＡＬ ＬＯＧＩＮ",        // fullwidth + NBSP
      "pay\u200Bpal log\u200Din")          // zero-width splits
    val got = rows.toDF("t")
      .select(graft.ops.Cleaning.confusableSkeleton(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(got(0) == "paypal login" && got(1) == "paypal login")
    assert(got(2) == "paypal login" && got(3) == "paypal login")
  }

  // --- Gif codec: cross-validated BOTH directions against the JDK's
  // independent ImageIO GIF codec, so encoder and decoder cannot share a
  // width-bump / KwKwK / interlace convention bug ---

  private def testPalette(n: Int): Array[Byte] = Array.tabulate(3 * n) { k =>
    val j = k / 3
    (if (k % 3 == 0) j * 37 % 256 else if (k % 3 == 1) j * 59 % 256 else j * 83 % 256).toByte
  }

  test("Gif.encodeGif -> ImageIO reader: pixels round-trip (plain and interlaced)") {
    for (interlace <- Seq(false, true); (w, h) <- Seq((1, 1), (7, 5), (23, 17), (64, 48))) {
      val pal = testPalette(16)
      val idx = Array.tabulate(w * h)(k => ((k * 7 + k / w * 3) % 16).toByte)
      val gif = graft.ops.Gif.encodeGif(w, h, pal, idx, interlace)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null && img.getWidth == w && img.getHeight == h, s"$w x $h i=$interlace")
      for (y <- 0 until h; x <- 0 until w) {
        val j = idx(y * w + x) & 0xff
        val expect = (0xff << 24) | ((j * 37 % 256) << 16) | ((j * 59 % 256) << 8) | (j * 83 % 256)
        assert(img.getRGB(x, y) == expect, s"($x,$y) w=$w h=$h i=$interlace")
      }
    }
  }

  test("ImageIO writer -> Gif.decodeGif: independent-encoder streams decode") {
    val n = 16
    val pal = testPalette(n)
    val (rs, gs, bs) = (new Array[Byte](n), new Array[Byte](n), new Array[Byte](n))
    for (j <- 0 until n) { rs(j) = pal(3 * j); gs(j) = pal(3 * j + 1); bs(j) = pal(3 * j + 2) }
    val cm = new java.awt.image.IndexColorModel(4, n, rs, gs, bs)
    for ((w, h) <- Seq((5, 3), (31, 29), (80, 60))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w) {
        val j = (x * 3 + y * 5) % n
        img.setRGB(x, y, (0xff << 24) | ((pal(3 * j) & 0xff) << 16) |
          ((pal(3 * j + 1) & 0xff) << 8) | (pal(3 * j + 2) & 0xff))
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", baos))
      val dec = graft.ops.Gif.decodeGif(baos.toByteArray)
      assert(dec.isDefined, s"$w x $h")
      val g = dec.get
      assert(g.width == w && g.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = 3 * (y * w + x)
        val rgb = ((g.rgb(o) & 0xff) << 16) | ((g.rgb(o + 1) & 0xff) << 8) | (g.rgb(o + 2) & 0xff)
        assert(rgb == (img.getRGB(x, y) & 0xffffff), s"($x,$y) $w x $h")
      }
    }
  }

  test("Gif.decodeGif: dictionary-growth stress (width bumps past 9 bits)") {
    // 256-color palette and a low-repetition pixel pattern force the LZW
    // dictionary through several code-width increases
    val pal = testPalette(256)
    val (w, h) = (101, 97)
    val idx = Array.tabulate(w * h)(k => ((k * 131 + (k / w) * 17) % 256).toByte)
    val gif = graft.ops.Gif.encodeGif(w, h, pal, idx)
    val g = graft.ops.Gif.decodeGif(gif).get
    for (k <- 0 until w * h) {
      val j = idx(k) & 0xff
      assert((g.rgb(3 * k) & 0xff) == j * 37 % 256 && (g.rgb(3 * k + 1) & 0xff) == j * 59 % 256)
    }
    // and through the 4096-entry cap with a mid-stream clear: enough
    // distinct-pair pixels to fill the dictionary
    val big = Array.tabulate(1 << 16)(k => ((k * 251 + k / 256 * 13) % 256).toByte)
    val gif2 = graft.ops.Gif.encodeGif(256, 256, pal, big)
    val g2 = graft.ops.Gif.decodeGif(gif2).get
    for (k <- 0 until big.length)
      assert((g2.rgb(3 * k + 2) & 0xff) == (big(k) & 0xff) * 83 % 256)
  }

  test("cross-format perceptual equality: PNG and GIF of the same pixels share a dHash") {
    // the property image near-dup dedup rests on: the fingerprint is a
    // function of PIXELS, not of container format — a re-encoded copy of
    // an image is a near-dup at Hamming 0 whichever codec carried it
    val gray = new Array[Int](72)
    for (y <- 0 until 8) {
      gray(y * 9) = 128
      for (x <- 0 until 8)
        gray(y * 9 + x + 1) = gray(y * 9 + x) + (if ((x * 3 + y * 7) % 2 == 0) 1 else -1)
    }
    // PNG path: grayscale color type 0, cycling filters
    val pngRaw = gray.map(_.toByte)
    val png = graft.ops.Image.encodePng(9, 8, 0, pngRaw, y => y % 5, null)
    val pngImg = graft.ops.Image.decodePng(png).get
    val pngHash = graft.ops.Image.dHashBits(graft.ops.Image.toGray(pngImg), 9, 8)
    // GIF path: a 256-entry identity-gray palette, interlaced for spice
    val pal = Array.tabulate(768)(k => (k / 3).toByte)
    val gif = graft.ops.Gif.encodeGif(9, 8, pal, gray.map(_.toByte), interlace = true)
    val g = graft.ops.Gif.decodeGif(gif).get
    val gifGray = Array.tabulate(72) { i =>
      (299 * (g.rgb(3 * i) & 0xff) + 587 * (g.rgb(3 * i + 1) & 0xff)
        + 114 * (g.rgb(3 * i + 2) & 0xff)) / 1000
    }
    val gifHash = graft.ops.Image.dHashBits(gifGray, 9, 8)
    assert(pngHash == gifHash, s"png=$pngHash gif=$gifHash")
    assert(pngHash.length == 64)
  }

  test("Gif.decodeGif: fuzz — truncations and bit flips never throw") {
    val pal = testPalette(16)
    val gif = graft.ops.Gif.encodeGif(9, 7, pal, Array.tabulate(63)(k => (k % 16).toByte))
    for (cut <- 0 until gif.length)
      graft.ops.Gif.decodeGif(java.util.Arrays.copyOf(gif, cut)) // must not throw
    for (i <- 0 until gif.length) {
      val m = gif.clone(); m(i) = (m(i) ^ 0x5a).toByte
      graft.ops.Gif.decodeGif(m) // wrong pixels allowed (no CRC); throwing is not
    }
    assert(graft.ops.Gif.decodeGif(null).isEmpty)
    assert(graft.ops.Gif.decodeGif("GIF89a".getBytes).isEmpty)
  }

  test("differential: Pii.mod97 fold equals BigInteger mod 97 on random IBAN shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7197)
    val cases = (1 to 60).map { _ =>
      val cc = (1 to 2).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      val chk = f"${rnd.nextInt(100)}%02d"
      val bban = (1 to (11 + rnd.nextInt(20))).map(_ =>
        if (rnd.nextBoolean()) ('0' + rnd.nextInt(10)).toChar else ('A' + rnd.nextInt(26)).toChar).mkString
      cc + chk + bban
    }
    def refValid(iban: String): Boolean = {
      val r = iban.drop(4) + iban.take(4)
      val digits = r.flatMap(c => if (c.isDigit) c.toString else (c - 'A' + 10).toString)
      new java.math.BigInteger(digits).mod(java.math.BigInteger.valueOf(97)) ==
        java.math.BigInteger.ONE
    }
    val got = cases.toDF("iban")
      .withColumn("dg", graft.ops.Pii.ibanDigits(col("iban")))
      .select(col("iban"), (graft.ops.Pii.mod97(col("dg")) === 1).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach(c => assert(got(c) == refValid(c), s"mod97 disagrees with BigInteger on $c"))
  }

  test("differential: triangleStats equals brute-force enumeration on random graphs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 3) {
      val n = 12
      val edges = (1 to 40).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
      val adj = Array.ofDim[Boolean](n, n)
      for ((a, b) <- edges if a != b) { adj(a)(b) = true; adj(b)(a) = true }
      val refTri = Array.fill(n)(0)
      for (a <- 0 until n; b <- a + 1 until n if adj(a)(b);
           c <- b + 1 until n if adj(a)(c) && adj(b)(c)) {
        refTri(a) += 1; refTri(b) += 1; refTri(c) += 1
      }
      val got = graft.ops.Graph.triangleStats(edges.toDF("src", "dst")).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      for (v <- 0 until n if adj(v).exists(identity))
        assert(got(v) == refTri(v).toLong, s"trial $trial node $v: ${got(v)} vs ${refTri(v)}")
    }
  }

  test("differential: Graph.hits matches a dense-matrix reference iteration") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(2718)
    val n = 8
    val edges = (1 to 20).map(_ => (rnd.nextInt(n), rnd.nextInt(n))).filter(e => e._1 != e._2).distinct
    val iters = 3
    // dense reference replaying the SAME determinism recipe (12-dp rounds)
    var h = Array.fill(n)(1.0); var a = Array.fill(n)(0.0)
    def rnd12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to iters) {
      val ar = Array.fill(n)(0.0)
      for ((u, v) <- edges) ar(v) += h(u)
      val an = math.sqrt(ar.map(x => rnd12(x * x)).sum)
      a = ar.map(x => if (an > 0) rnd12(x / an) else 0.0)
      val hr = Array.fill(n)(0.0)
      for ((u, v) <- edges) hr(u) += a(v)
      val hn = math.sqrt(hr.map(x => rnd12(x * x)).sum)
      h = hr.map(x => if (hn > 0) rnd12(x / hn) else 0.0)
    }
    val got = graft.ops.Graph.hits(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    for (v <- nodes) {
      assert(math.abs(got(v)._1 - h(v)) < 1e-9, s"hub($v): ${got(v)._1} vs ${h(v)}")
      assert(math.abs(got(v)._2 - a(v)) < 1e-9, s"auth($v): ${got(v)._2} vs ${a(v)}")
    }
  }

  test("differential: wordPieceStats equals a reference greedy tokenizer on random words") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val start = Seq("spark", "stream", "join", "data", "the", "th",
      "pro", "con", "re", "ing") ++ ('a' to 'z').map(_.toString)
    val cont = Seq("ing", "tion", "ream", "ed", "er", "es", "s") ++
      ('a' to 'z').map(_.toString)
    def ref(word: String): (Int, Int) = {
      if (word.length > 16) return (1, 1)
      var pos = 0; var cnt = 0
      while (pos < word.length) {
        val pieces = if (pos == 0) start else cont
        val best = pieces.filter(p => word.startsWith(p, pos)).map(_.length).maxOption.getOrElse(0)
        if (best == 0) return (1, 1)
        pos += best; cnt += 1
      }
      (cnt, 0)
    }
    val rnd = new scala.util.Random(424242)
    val alphabet = "abcdefghijklmnopqrstuvwxyz.é0"
    val words = (1 to 120).map(_ =>
      (1 to (1 + rnd.nextInt(18))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString).distinct
    val got = words.toDF("w")
      .select(col("w"), graft.ops.TextAnalysis.wordPieceStats(col("w"), start, cont).as("r"))
      .select(col("w"), col("r.n_pieces"), col("r.n_unk"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    words.foreach(w => assert(got(w) == ref(w), s"'$w': ${got(w)} vs ${ref(w)}"))
  }

  test("round-7b queries: semantic invariants on the real code paths at sf0.001") {
    import org.apache.spark.sql.functions._
    // w13: bars are well-formed — low <= open/close <= high, n >= 1
    val bars = graft.queries.WindowQueries.w13Ohlc.fn(spark, sf)
    assert(bars.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close") ||
      col("n_events") < 1).isEmpty)
    // w11: a reached level implies its timestamps exist, in funnel order
    val fun = graft.queries.WindowQueries.w11Funnel.fn(spark, sf)
    assert(fun.filter(
      (col("reached") >= 1 && col("t_view_us").isNull) ||
      (col("reached") >= 2 && (col("t_click_us").isNull || col("t_click_us") < col("t_view_us"))) ||
      (col("reached") === 3 && (col("t_purchase_us").isNull || col("t_purchase_us") < col("t_click_us")))).isEmpty)
    // ask5: attribution flag consistent, F1 in [0, 1]
    val att = graft.queries.TextQueries.ask5Attribution.fn(spark, sf)
    assert(att.filter(col("attributed") =!= (col("best_idx") === col("target_idx")) ||
      col("best_f1") < 0 || col("best_f1") > 1).isEmpty)
    // x32: every stratum's draw fills its seats and seats sum to the budget
    val ney = graft.queries.TextQueries.x32Neyman.fn(spark, sf)
    val perStratum = ney.groupBy("stratum").agg(first("alloc").as("a"), count(lit(1)).as("got"))
    assert(perStratum.filter(col("a") =!= col("got")).isEmpty)
    assert(perStratum.agg(sum("a")).collect().head.getLong(0) == 100L)
    // ev8: the band is ordered and brackets plausibly
    val ci = graft.queries.MiscQueries.ev8BootstrapCi.fn(spark, sf).collect().head
    assert(ci.getDouble(2) <= ci.getDouble(3), s"ci_lo > ci_hi: $ci")
    // x33: PSI terms are finite and each bucket's shares are probabilities
    val psi = graft.queries.TextQueries.x33PsiDrift.fn(spark, sf)
    assert(psi.filter(col("p_ref") <= 0 || col("p_ref") >= 1 ||
      col("p_cur") <= 0 || col("p_cur") >= 1 || isnan(col("psi_term"))).isEmpty)
  }

  test("Image.exifOrientation: both endians, APP0-shadowed APP1, fail-to-None edges") {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    def tiffLE(orient: Int): Array[Byte] =
      "II".getBytes ++ Array[Byte](42, 0, 8, 0, 0, 0) ++ // magic + ifd@8
        Array[Byte](1, 0) ++ // one entry
        Array[Byte](0x12, 0x01, 3, 0, 1, 0, 0, 0, orient.toByte, 0, 0, 0)
    def tiffBE(orient: Int): Array[Byte] =
      "MM".getBytes ++ Array[Byte](0, 42, 0, 0, 0, 8) ++
        Array[Byte](0, 1) ++
        Array[Byte](0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, orient.toByte, 0, 0)
    def exifApp1(tiff: Array[Byte]): Array[Byte] =
      seg(0xe1, "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff)
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val E = graft.ops.Image
    assert(E.exifOrientation(soi ++ exifApp1(tiffLE(6))).contains(6))
    assert(E.exifOrientation(soi ++ exifApp1(tiffBE(8))).contains(8))
    // APP0/JFIF before APP1: the walk must hop over it
    val jfif = seg(0xe0, "JFIF".getBytes ++ new Array[Byte](9))
    assert(E.exifOrientation(soi ++ jfif ++ exifApp1(tiffLE(3))).contains(3))
    assert(E.exifOrientation(null).isEmpty)
    assert(E.exifOrientation("nope".getBytes).isEmpty)
    assert(E.exifOrientation(soi ++ jfif).isEmpty) // no APP1 at all
    assert(E.exifOrientation(soi ++ exifApp1(tiffLE(9))).isEmpty) // out of range
    // orientation value 0 and truncated TIFF both quarantine
    assert(E.exifOrientation(soi ++ exifApp1(tiffLE(0))).isEmpty)
    assert(E.exifOrientation(soi ++ exifApp1(tiffBE(5).take(10))).isEmpty)
    val full = soi ++ jfif ++ exifApp1(tiffBE(7))
    for (cut <- 0 until full.length)
      E.exifOrientation(java.util.Arrays.copyOf(full, cut)) // never throws
  }

  test("Curation.neymanSample: variance-proportional seats, exact budget") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // stratum 'wild' has x10 the spread of 'tame' at equal size → Neyman
    // gives it ~10/11 of the budget; a proportional allocator would split 50/50
    val rows = (0 until 200).map { i =>
      if (i % 2 == 0) ("tame", 1000L + i % 10, i.toLong)
      else ("wild", 1000L + (i * 37) % 1000, i.toLong)
    }
    val df = rows.toDF("s", "v", "id")
    val out = graft.ops.Curation.neymanSample(df, col("s"), col("v"), col("id"), 50)
    val alloc = out.groupBy("stratum").agg(first("alloc").as("a"), count(lit(1)).as("got"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(alloc.values.map(_._1).sum == 50, s"seats must sum to the budget: $alloc")
    assert(alloc("wild")._1 > 40, s"high-variance stratum must dominate: $alloc")
    assert(alloc.values.forall(v => v._1 == v._2), "draw must fill every seat")
    // saturation: a 3-row stratum with huge spread cannot be allocated more
    // than its 3 rows — alloc caps at N_h and the draw fills exactly it
    val tiny = (Seq(("mini", 1L, 0L), ("mini", 9999L, 1L), ("mini", 5000L, 2L)) ++
      (0 until 100).map(i => ("bulk", 500L + i % 3, (10 + i).toLong))).toDF("s", "v", "id")
    val sat = graft.ops.Curation.neymanSample(tiny, col("s"), col("v"), col("id"), 40)
      .groupBy("stratum").agg(first("alloc").as("a"), count(lit(1)).as("got"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sat("mini") == ((3L, 3L)), s"saturated stratum must cap at its size: $sat")
  }

  test("Graph.hits: directed star — center is the hub, leaves are the authorities") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = Seq((0, 1), (0, 2), (0, 3), (9, 1)).toDF("src", "dst")
    val r = graft.ops.Graph.hits(edges, 3).collect()
      .map(x => x.getInt(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r(0)._1 > 0.9 && r(0)._2 == 0.0) // center: pure hub
    assert(r(1)._2 > r(2)._2) // node 1 has two in-links → strongest authority
    assert(r(2)._2 == r(3)._2 && r(2)._2 > 0) // symmetric leaves tie
    assert(r(1)._1 == 0.0 && r(2)._1 == 0.0) // leaves link nothing → hub 0
  }

  test("Graph.triangleStats: K4 clique, star, loops and duplicate edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // K4 on 1..4 (4 triangles, clustering 1.0), star 5-{6,7} (no triangle),
    // plus noise the canonicalization must erase: a self-loop, a duplicate
    // edge, and a reversed duplicate
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (5, 6), (5, 7), (2, 2), (3, 4), (4, 3)).toDF("src", "dst")
    val got = graft.ops.Graph.triangleStats(edges).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    (1 to 4).foreach(n => assert(got(n) == ((3L, 3L, 1.0)), s"node $n: ${got(n)}"))
    assert(got(5) == ((2L, 0L, 0.0)))
    assert(got(6) == ((1L, 0L, 0.0)) && got(7) == ((1L, 0L, 0.0)))
  }

  test("Kmv: exact below k, merge is set-identical to whole, 3-sigma error above k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 5000
    val df = (0 until n).map(i => ("big", i % 3, s"item_$i")).toDF("key", "shard", "w")
      .union((0 until 20).map(i => ("small", i % 3, s"s_$i")).toDF("key", "shard", "w"))
    val whole = graft.ops.Kmv.sketch(df, Seq("key"), col("w"))
    // merge of 3 shard sketches must equal the whole sketch as a SET of
    // (pos, h) rows — KMV's merge algebra is exact, not approximate
    val parts = graft.ops.Kmv.sketch(df, Seq("key", "shard"), col("w")).select("key", "h")
    val merged = graft.ops.Kmv.merge(parts, Seq("key"))
    assert(whole.select("key", "pos", "h").except(merged.select("key", "pos", "h")).isEmpty)
    assert(merged.select("key", "pos", "h").except(whole.select("key", "pos", "h")).isEmpty)
    val est = graft.ops.Kmv.estimate(whole, Seq("key")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") == 20.0) // below k: the count is exact, not estimated
    // KMV rel-err stddev ≈ 1/sqrt(k−2) ≈ 0.127 at k=64 → 3σ bound
    assert(math.abs(est("big") - n) / n < 0.4, s"est=${est("big")}")
  }

  // --- Audio.decodeWavPcm: hand-authored WAV bytes (independent of the m9
  // query's builder, so spec and oracle fixture can't share a bug) ---

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def fmtChunk(ch: Int, rate: Int, bits: Int): Array[Byte] =
    fourcc("fmt ") ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate.toLong * ch * (bits / 8)) ++ le16(ch * (bits / 8)) ++ le16(bits)
  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = fourcc("WAVE") ++ chunks.flatten
    fourcc("RIFF") ++ le32(body.length) ++ body
  }
  private def data16(samples: Int*): Array[Byte] =
    fourcc("data") ++ le32(samples.length * 2L) ++ samples.flatMap(s => le16(s & 0xffff))
  private def data8(samples: Int*): Array[Byte] =
    fourcc("data") ++ le32(samples.length.toLong) ++ samples.map(_.toByte)

  test("Audio.decodeWavPcm: mono 16-bit exact features") {
    val w = wav(fmtChunk(1, 16000, 16), data16(100, -200, 0, 300, -50))
    val f = graft.ops.Audio.decodeWavPcm(w).get
    assert(f.sampleRate == 16000 && f.channels == 1 && f.bits == 16 && f.nFrames == 5)
    assert(f.peak == 300 && f.sumSq == 142500L)
    assert(f.zeroCross == 3L) // sign-of-negative flips: +→−, −→+, +→−
    assert(f.silent == 1L)    // only the exact 0; |−50| is NOT < 50 (strict)
  }

  test("Audio.decodeWavPcm: stereo pairs zero-crossings per channel, not across") {
    // interleaved L0 R0 L1 R1: L flips sign once, R never — across-channel
    // pairing would see 3 flips
    val w = wav(fmtChunk(2, 8000, 16), data16(10, 5, -10, 7))
    val f = graft.ops.Audio.decodeWavPcm(w).get
    assert(f.nFrames == 2 && f.zeroCross == 1L)
  }

  test("Audio.decodeWavPcm: 8-bit samples are unsigned-centered") {
    val w = wav(fmtChunk(1, 8000, 8), data8(128, 0, 255, 128))
    val f = graft.ops.Audio.decodeWavPcm(w).get
    assert(f.bits == 8 && f.nFrames == 4)
    assert(f.peak == 128 && f.sumSq == (128L * 128 + 127L * 127))
    assert(f.zeroCross == 2L && f.silent == 2L)
  }

  test("Audio.decodeWavPcm: chunk order and JUNK padding don't matter") {
    val junkOdd = fourcc("JUNK") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd size + pad
    val a = graft.ops.Audio.decodeWavPcm(wav(fmtChunk(1, 44100, 16), data16(7, -7))).get
    val b = graft.ops.Audio.decodeWavPcm(wav(junkOdd, data16(7, -7), fmtChunk(1, 44100, 16))).get
    assert(a == b && a.sampleRate == 44100)
  }

  test("Audio.decodeWavPcm: truncation and random-byte fuzz never throws") {
    val w = wav(fmtChunk(2, 22050, 16), data16(5, -5, 300, -300, 0, 7))
    for (cut <- 0 to w.length)
      graft.ops.Audio.decodeWavPcm(java.util.Arrays.copyOf(w, cut)) // must not throw
    val rnd = new scala.util.Random(20260814)
    for (_ <- 1 to 300) {
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      graft.ops.Audio.decodeWavPcm(b)
      if (b.length >= 12) { // valid RIFF/WAVE leader grafted onto noise
        System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
        System.arraycopy("WAVE".getBytes, 0, b, 8, 4)
        graft.ops.Audio.decodeWavPcm(b)
      }
    }
  }

  test("Audio.decodeWavPcm: fail-to-None edges") {
    val A = graft.ops.Audio
    assert(A.decodeWavPcm(null).isEmpty)
    assert(A.decodeWavPcm("not a wav at all".getBytes).isEmpty)
    // declared data size past the payload end (truncated)
    val trunc = wav(fmtChunk(1, 8000, 16), fourcc("data") ++ le32(100) ++ le16(1))
    assert(A.decodeWavPcm(trunc).isEmpty)
    // stereo 16-bit with a size not divisible by the 4-byte frame
    val misaligned = wav(fmtChunk(2, 8000, 16), data16(1, 2, 3))
    assert(A.decodeWavPcm(misaligned).isEmpty)
    // IEEE-float format tag (3): not PCM, must not parse as it
    val floatTag = wav(fourcc("fmt ") ++ le32(16) ++ le16(3) ++ le16(1) ++ le32(8000) ++
      le32(32000) ++ le16(4) ++ le16(32), data16(1, 2))
    assert(A.decodeWavPcm(floatTag).isEmpty)
    // missing data chunk entirely
    assert(A.decodeWavPcm(wav(fmtChunk(1, 8000, 16))).isEmpty)
  }
}
