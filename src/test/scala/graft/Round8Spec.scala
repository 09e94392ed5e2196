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
