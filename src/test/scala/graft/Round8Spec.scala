package graft

import graft.ops.{Dedup, Image, Pdf}
import org.apache.spark.sql.functions._

/** Round-8 additions: PDF embedded-image extraction (XObject dicts +
  * q/cm/Do placement walk), the d17 probe-side fan-out cap, and the
  * portable-sketch query helpers. Image fixtures are assembled through
  * [[Pdf.buildImagesPdf]] but every assertion here pins values the
  * builder does NOT compute (raw sample identity, composed CTMs,
  * cross-stream isolation), and the adversarial cases are hand-made. */
class Round8Spec extends SparkSpec {

  private def grayRamp(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 5 + 3) % 256).toByte)

  test("Pdf.extractImages: gray predictor + RGB plain, dims/placement/samples exact") {
    val g = grayRamp(4, 3)
    val rgb = Array.tabulate(2 * 2 * 3)(i => ((i * 31 + 7) % 256).toByte)
    val pdf = Pdf.buildImagesPdf("two figures", Seq(
      Pdf.ImageFixture(4, 3, 0, g, x = 10, y = 20, dispW = 40, dispH = 30,
        predictor = true, corrupt = false),
      Pdf.ImageFixture(2, 2, 2, rgb, x = 200, y = 600, dispW = 20, dispH = 20,
        predictor = false, corrupt = false)), compress = false)
    val out = Pdf.extractImages(pdf)
    assert(out.map(_.name) == Seq("Im0", "Im1"))
    val im0 = out.head
    assert(im0.width == 4 && im0.height == 3 && im0.colorType == 0)
    assert(im0.x == 10.0 && im0.y == 20.0 && im0.dispW == 40.0 && im0.dispH == 30.0)
    assert(java.util.Arrays.equals(im0.raw, g))
    val im1 = out(1)
    assert(im1.colorType == 2 && java.util.Arrays.equals(im1.raw, rgb))
  }

  test("Pdf.extractImages: truncated image stream quarantines to raw=null, metadata kept") {
    val pdf = Pdf.buildImagesPdf("broken", Seq(
      Pdf.ImageFixture(3, 3, 0, grayRamp(3, 3), 0, 0, 30, 30,
        predictor = false, corrupt = true)), compress = true)
    val out = Pdf.extractImages(pdf)
    assert(out.size == 1)
    assert(out.head.raw == null)
    assert(out.head.width == 3 && out.head.height == 3)
  }

  test("Pdf.extractImages: nested q/cm composes the CTM; Q restores it") {
    // hand-built content stream: outer translate(5,7), inner scale(2,3)
    // around Im0; after Q the second draw sees only the outer translate
    val g = grayRamp(2, 2)
    val base = Pdf.buildImagesPdf("ctm", Seq(
      Pdf.ImageFixture(2, 2, 0, g, 0, 0, 1, 1, predictor = false, corrupt = false),
      Pdf.ImageFixture(2, 2, 0, g, 0, 0, 1, 1, predictor = false, corrupt = false)),
      compress = false)
    val raw = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val patched = raw.replaceFirst(
      """q 1 0 0 1 0 0 cm /Im0 Do Q q 1 0 0 1 0 0 cm /Im1 Do Q""",
      """q 1 0 0 1 5 7 cm q 2 0 0 3 0 0 cm /Im0 Do Q /Im1 Do Q""")
    assert(patched != raw, "patch must apply")
    // /Length of the content stream changed? No — replacement is same length
    assert(patched.length == raw.length)
    val out = Pdf.extractImages(patched.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(out.size == 2)
    // inner draw: scale then translate → a=2, d=3, origin (5,7)
    assert(out.head.dispW == 2.0 && out.head.dispH == 3.0 &&
      out.head.x == 5.0 && out.head.y == 7.0)
    // after Q: only the translate remains
    assert(out(1).dispW == 1.0 && out(1).dispH == 1.0 &&
      out(1).x == 5.0 && out(1).y == 7.0)
  }

  test("Pdf.extractImages: /DCTDecode streams decode through the real JPEG decoder") {
    val w = 19; val h = 11
    val px = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      (((x / 8) * 31 + (y / 8) * 17 + 40) % 256).toByte // block-constant: exact round-trip
    }
    val pdf = Pdf.buildImagesPdf("scan", Seq(
      Pdf.ImageFixture(w, h, 0, px, 5, 6, 76, 44, predictor = false,
        corrupt = false, dct = true)), compress = true)
    val out = Pdf.extractImages(pdf)
    assert(out.size == 1)
    assert(out.head.width == w && out.head.height == h && out.head.colorType == 0)
    assert(java.util.Arrays.equals(out.head.raw, px))
    // truncated JPEG stream → metadata kept, pixels quarantined
    val bad = Pdf.extractImages(Pdf.buildImagesPdf("scan", Seq(
      Pdf.ImageFixture(w, h, 0, px, 5, 6, 76, 44, predictor = false,
        corrupt = true, dct = true)), compress = false))
    assert(bad.size == 1 && bad.head.raw == null && bad.head.width == w)
  }

  test("Pdf.extractImages: no images / garbage / text-only PDFs yield empty") {
    assert(Pdf.extractImages(Pdf.buildMinimalPdf("plain", compress = true)).isEmpty)
    assert(Pdf.extractImages(Array[Byte](1, 2, 3)).isEmpty)
    assert(Pdf.extractImages(Array.emptyByteArray).isEmpty)
  }

  test("Pdf: image sample bytes cannot leak into the text layer") {
    // samples spell a show-text operator; a parser that concatenates image
    // streams into page content would surface "fake" (or worse, an
    // unbalanced '(' would swallow later text)
    val evil = "(fake) Tj (".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val pdf = Pdf.buildImagesPdf("real text", Seq(
      Pdf.ImageFixture(evil.length, 1, 0, evil, 0, 0, 10, 10,
        predictor = false, corrupt = false)), compress = false)
    val text = Pdf.extractText(pdf)
    assert(text.contains("real text"))
    assert(!text.contains("fake"))
    // and the samples still extract intact on the image path
    assert(java.util.Arrays.equals(Pdf.extractImages(pdf).head.raw, evil))
  }

  test("Pdf→Image: extracted samples re-encode to a decodable PNG with same pixels") {
    val g = grayRamp(5, 4)
    val pdf = Pdf.buildImagesPdf("roundtrip", Seq(
      Pdf.ImageFixture(5, 4, 0, g, 0, 0, 50, 40, predictor = true, corrupt = false)),
      compress = true)
    val im = Pdf.extractImages(pdf).head
    val png = Image.encodePng(im.width, im.height, im.colorType, im.raw)
    val dec = Image.decodePng(png)
    assert(dec.nonEmpty && java.util.Arrays.equals(dec.get.raw, g))
  }

  test("Dedup.containmentPairs: probeCap is recall-monotone and inert when slack") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      val base = s"w${i / 8}a w${i / 8}b w${i / 8}c common text tail ${i % 8} x y z"
      (i.toLong, if (i % 8 == 7) base.split(" ").take(5).mkString(" ") else base)
    }.toDF("id", "text")
    def pairs(cap: Int) =
      Dedup.containmentPairs(docs, "id", "text", w = 2, probeK = 3,
        indexDfCap = 50, threshold = 0.8, probeCap = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slack = pairs(1000)
    assert(pairs(64) == slack, "cap far above cluster sizes must not change results")
    assert(pairs(1).subsetOf(slack), "tight cap may only drop pairs, never invent them")
    assert(slack.nonEmpty)
  }

  test("Pdf.extractSegments: strokes, filled rects, curves-as-endpoints, clipping dropped") {
    val content = ("BT ET " +
      "100 200 m 300 200 l S " +            // stroked line
      "50 60 20 10 re f " +                 // filled rect → 4 outline segs
      "0 0 m 10 10 20 20 30 5 c S " +       // curve → endpoint segment
      "400 400 m 500 400 l n "              // clipping path → dropped
      ).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // wrap via the minimal shell: reuse buildMinimalPdf's layout by
    // patching its content — simpler: hand-assemble the one-stream PDF
    val pdf = ("%PDF-1.4\n4 0 obj << /Length " + content.length + " >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ content ++
      "\nendstream endobj\ntrailer\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val segs = Pdf.extractSegments(pdf)
    assert(segs.contains(Pdf.Segment(100, 200, 300, 200)))
    assert(segs.count(s => s.x0 == 50 || s.x1 == 50) >= 2) // rect outline present
    assert(segs.contains(Pdf.Segment(0, 0, 30, 5)))        // curve endpoint
    assert(!segs.exists(s => s.y0 == 400.0 && s.y1 == 400.0 && s.x1 == 500.0))
  }

  test("Pdf.extractSegments: s/b/f emit the implicit close-path edge; S does not") {
    // a 3-edge open rectangle path: m (10,10) → l (110,10) → l (110,60) → l (10,60)
    def pdfFor(paint: String): Array[Byte] = {
      val content = (s"10 10 m 110 10 l 110 60 l 10 60 l $paint ")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      ("%PDF-1.4\n4 0 obj << /Length " + content.length + " >> stream\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ content ++
        "\nendstream endobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val closing = Pdf.Segment(10, 60, 10, 10)
    for (paint <- Seq("s", "b", "b*", "f", "f*", "B", "B*")) {
      val segs = Pdf.extractSegments(pdfFor(paint))
      assert(segs.length == 4 && segs.contains(closing), s"paint $paint must close")
    }
    val open = Pdf.extractSegments(pdfFor("S"))
    assert(open.length == 3 && !open.contains(closing), "S strokes as constructed")
    // fill closes EVERY subpath, not just the current one
    val multi = ("10 10 m 110 10 l 110 60 l 200 10 m 300 10 l 300 60 l f ")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val mpdf = ("%PDF-1.4\n4 0 obj << /Length " + multi.length + " >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ multi ++
      "\nendstream endobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val msegs = Pdf.extractSegments(mpdf)
    assert(msegs.contains(Pdf.Segment(110, 60, 10, 10)))
    assert(msegs.contains(Pdf.Segment(300, 60, 200, 10)))
    assert(msegs.length == 6)
  }

  test("Pdf.extractSegments: cm transforms path points; Q restores") {
    val content = ("q 2 0 0 3 10 20 cm 1 1 m 5 1 l S Q 1 1 m 5 1 l S ")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val pdf = ("%PDF-1.4\n4 0 obj << /Length " + content.length + " >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ content ++
      "\nendstream endobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val segs = Pdf.extractSegments(pdf)
    // (1,1) under [2 0 0 3 10 20] → (12, 23); (5,1) → (20, 23)
    assert(segs.head == Pdf.Segment(12, 23, 20, 23))
    assert(segs(1) == Pdf.Segment(1, 1, 5, 1))
  }

  test("TableDetect.latticeGrid: hairline pair collapse, decorative drop, table split") {
    import graft.ops.TableDetect
    // grid 1: 3 h rules (rows 2) at y 100/70/40, each as a hairline PAIR
    // (±0.25); 3 v rules at x 10/60/110
    val hs = Seq(100.25, 99.75, 70.25, 69.75, 40.25, 39.75).map(y => (y, 5.0, 115.0)) ++
      Seq((300.0, 50.0, 56.0)) ++                  // decorative — too short? len 6 ≥ minLen? pass minLen=10 via filter upstream; latticeGrid sees only rules — simulate pre-filtered input
      Seq((500.0, 5.0, 115.0))                     // lone far rule: its own group, < minRows+1 → dropped
    val vs = Seq((10.0, 35.0, 105.0), (60.0, 35.0, 105.0), (110.0, 35.0, 105.0))
    val cells = TableDetect.latticeGrid(hs, vs, posTol = 2.0, maxRowGap = 60.0,
      minCols = 2, minRows = 2)
    // the 300/500 rules: 500 alone and 300 alone (gaps > 60), both single → dropped
    assert(cells.map(_._1).distinct == Seq(0))
    assert(cells.map(c => (c._2, c._3)).toSet ==
      Set((0, 0), (0, 1), (1, 0), (1, 1)))
    // hairline pairs collapsed: row 0 bounds are the member means
    val c00 = cells.find(c => c._2 == 0 && c._3 == 0).get
    assert(c00._6 == 70.0 && c00._7 == 100.0 && c00._4 == 10.0 && c00._5 == 60.0)
  }

  test("TableDetect.latticeGrid: vertical rules assign per table; two stacked tables") {
    import graft.ops.TableDetect
    val hs = Seq(640.0, 610.0, 580.0).map(y => (y, 75.0, 285.0)) ++
      Seq(240.0, 220.0, 200.0).map(y => (y, 105.0, 395.0))
    val vs = Seq((80.0, 575.0, 645.0), (180.0, 575.0, 645.0), (280.0, 575.0, 645.0),
      (110.0, 195.0, 245.0), (250.0, 195.0, 245.0), (390.0, 195.0, 245.0))
    val cells = TableDetect.latticeGrid(hs, vs, 2.0, 60.0, 2, 2)
    assert(cells.map(_._1).distinct.sorted == Seq(0, 1))
    // table 0 (top) uses only the tall vs; table 1 only the short ones
    val t0cols = cells.filter(_._1 == 0).map(_._4).distinct.sorted
    assert(t0cols == Seq(80.0, 180.0))
    val t1cols = cells.filter(_._1 == 1).map(_._4).distinct.sorted
    assert(t1cols == Seq(110.0, 250.0))
  }

  test("Dedup.bucketRepDedup: giant cluster yields O(N) rows, first-wins reps, no cartesian") {
    import spark.implicits._
    // 150-doc exact-dup cluster + 150 unique docs: a pair-emitting chain
    // would materialize 150·149/2 ≈ 11k candidate rows from one bucket
    val docs = (0 until 300).map { i =>
      (i.toLong, if (i % 2 == 0) "mega boiler plate body text alpha beta gamma"
                 else s"unique doc $i with its own content words ${i * 7}")
    }.toDF("id", "text")
    val out = graft.ops.Dedup.bucketRepDedup(docs, "id", col("text"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    val rows = out.collect()
    assert(rows.length == 300, "output must be one row per doc, never per pair")
    val dups = rows.filter(_.getBoolean(3))
    // every clone except doc 0 dedups to doc 0 at Jaccard exactly 1
    assert(dups.map(_.getLong(0)).sorted.toSeq == (2 until 300 by 2).map(_.toLong))
    assert(dups.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 1.0))
    // uniques are never flagged
    assert(rows.filter(r => r.getLong(0) % 2 == 1).forall(!_.getBoolean(3)))
  }

  test("licenseDetect: real LGPL-3.0 text (which embeds the GPL anchor) stays LGPL") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    // the actual LGPL-3.0 body contains "GNU General Public License"
    // verbatim — specificity ordering, not anchor presence, decides
    val docs = Seq(
      ("under the terms of the GNU Lesser General Public License, which " +
        "incorporates the terms and conditions of version 3 of the GNU " +
        "General Public License", "LGPL-3.0", "copyleft"),
      ("released under the terms of the GNU General Public License as published", "GPL-3.0", "copyleft"),
      ("Permission is hereby granted, free of charge, to anyone", "MIT", "permissive"))
      .toDF("text", "want", "wantFam")
    val det = TextAnalysis.licenseDetect(col("text"))
    val rows = docs.select(det.getField("license").as("got"), col("want"),
      det.getField("family").as("gotFam"), col("wantFam")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1) &&
      r.getString(2) == r.getString(3), r.toString))
  }

  test("valid-but-empty containers emit a non-null marker row (≠ malformed, ≠ absent)") {
    import spark.implicits._
    import graft.ops.{Avi, Tar, TfRecord, Wiki, Xlsx}
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close(); bo.toByteArray
    }
    // one (empty, malformed) payload pair per container format
    val tarDf = Seq((1, Tar.encodeTar(Seq.empty)), (2, Array.fill(600)(9.toByte)))
      .toDF("id", "payload")
    val tarRows = Tar.memberStage(tarDf, "payload", "m")
      .select(col("id"), col("m").isNull.as("malformed"), col("m.name").isNull.as("noName"))
      .collect().map(r => r.getInt(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(tarRows(1) == (false, true), "empty shard: non-null struct, null members")
    assert(tarRows(2) == (true, true), "malformed shard: null struct")
    val tfrDf = Seq((1, Array.emptyByteArray), (2, Array.fill(40)(7.toByte))).toDF("id", "payload")
    val tfrRows = TfRecord.exampleStage(tfrDf, "payload", "e")
      .select(col("id"), col("e").isNull, col("e.record_idx").isNull)
      .collect().map(r => (r.getInt(0), (r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(tfrRows(1) == (false, true) && tfrRows(2) == (true, true))
    val wikiDf = Seq((1, gz(Wiki.encodeDump(Seq.empty))), (2, Array.fill(30)(1.toByte))).toDF("id", "payload")
    val wikiRows = Wiki.pageStage(wikiDf, "payload", "p")
      .select(col("id"), col("p").isNull, col("p.title").isNull)
      .collect().map(r => (r.getInt(0), (r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(wikiRows(1) == (false, true) && wikiRows(2) == (true, true))
    val xlsxDf = Seq((1, Xlsx.encodeXlsx(Seq.empty, Seq.empty)), (2, Array.fill(80)(2.toByte))).toDF("id", "payload")
    val xlsxRows = Xlsx.cellStage(xlsxDf, "payload", "c")
      .select(col("id"), col("c").isNull, col("c.ref").isNull)
      .collect().map(r => (r.getInt(0), (r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(xlsxRows(1) == (false, true) && xlsxRows(2) == (true, true))
    val aviDf = Seq((1, Avi.encodeMjpegAvi(8, 8, 40000, Seq.empty)), (2, Array.fill(40)(3.toByte))).toDF("id", "payload")
    val aviRows = Avi.frameStatsStage(aviDf, "payload", "f")
      .select(col("id"), col("f").isNull, col("f.frame_idx").isNull, col("f.width"))
      .collect()
    val a1 = aviRows.find(_.getInt(0) == 1).get
    assert(!a1.getBoolean(1) && a1.getBoolean(2) && a1.getInt(3) == 8,
      "empty movi keeps container meta with null frame fields")
    val a2 = aviRows.find(_.getInt(0) == 2).get
    assert(a2.getBoolean(1))
  }

  test("Tar memberStage: WebDataset key/ext split is over the basename") {
    import spark.implicits._
    import graft.ops.Tar
    val shard = Tar.encodeTar(Seq(
      ("shard.v1/000017.jpg", Array[Byte](1)),
      ("data.v1/000017", Array[Byte](2)),      // extensionless under a dotted dir
      (".hidden", Array[Byte](3))))
    val rows = Tar.memberStage(Seq((1, shard)).toDF("id", "payload"), "payload", "m")
      .select(col("m.name"), col("m.sample_key"), col("m.ext"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows("shard.v1/000017.jpg") == ("shard.v1/000017", "jpg"))
    assert(rows("data.v1/000017") == ("data.v1/000017", ""), "a dotted dir must not donate the dot")
    assert(rows(".hidden") == (".hidden", ""), "a leading-dot basename has no extension")
  }

  test("Hll portable estimate: within 20% on a 1k-distinct stream, exact merge algebra") {
    import spark.implicits._
    import graft.ops.Hll
    val df = (0 until 1000).map(i => ("k", s"item_$i", i % 4)).toDF("g", "w", "b")
    val whole = Hll.estimate(Hll.registers(df, Seq("g"), col("w")), Seq("g"))
      .collect().head.getDouble(1)
    assert(math.abs(whole - 1000.0) / 1000.0 < 0.2, s"est $whole")
    val merged = Hll.estimate(
      Hll.merge(Hll.registers(df, Seq("g", "b"), col("w")), Seq("g")), Seq("g"))
      .collect().head.getDouble(1)
    assert(merged == whole, "merge of part sketches must equal sketch of whole")
  }
}
