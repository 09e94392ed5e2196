package graft

import graft.ops.Jpeg
import org.scalatest.funsuite.AnyFunSuite

/** Baseline-JPEG codec differentials against the JDK's INDEPENDENT
  * ImageIO implementation (the GIF-LZW cross-validation discipline):
  * my encoder must be readable by ImageIO, ImageIO's encoder must be
  * readable by my decoder, and both decoders must agree on the same
  * bytes within IDCT rounding. */
class JpegSpec extends AnyFunSuite {

  private def imageIoDecode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def imageIoEncode(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  private def blockConstant(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      (((x / 8) * 7 + (y / 8) * 11 + seed) % 256).toByte
    }

  test("encodeGray(qStep=8) round-trips block-constant images EXACTLY through own decoder") {
    for ((w, h, seed) <- Seq((8, 8, 3), (17, 9, 40), (24, 16, 200), (5, 21, 129))) {
      val px = blockConstant(w, h, seed)
      val dec = Jpeg.decode(Jpeg.encodeGray(w, h, px)).get
      assert(dec.width == w && dec.height == h && dec.components == 1)
      assert(java.util.Arrays.equals(dec.pixels, px), s"($w,$h,$seed)")
    }
  }

  test("ImageIO decodes my encoder's block-constant output to the planted pixels") {
    val (w, h, seed) = (20, 13, 77)
    val px = blockConstant(w, h, seed)
    val img = imageIoDecode(Jpeg.encodeGray(w, h, px))
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (px(y * w + x) & 0xff), s"($x,$y)")
  }

  test("my decoder agrees with ImageIO on my encoder's output for arbitrary content") {
    val rng = new scala.util.Random(7)
    val (w, h) = (37, 22)
    val px = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      ((x * 6 + y * 4 + rng.nextInt(7)) % 256).toByte
    }
    val jpg = Jpeg.encodeGray(w, h, px, qStep = 2)
    val mine = Jpeg.decode(jpg).get
    val ref = imageIoDecode(jpg)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (mine.pixels(y * w + x) & 0xff)))
    assert(maxDiff <= 1, s"maxDiff $maxDiff") // IDCT rounding only
  }

  test("my decoder reads ImageIO-encoded GRAY JPEGs (independent encoder)") {
    val (w, h) = (29, 18)
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 5 + y * 9) % 256)
    val jpg = imageIoEncode(src, 0.9f)
    val mine = Jpeg.decode(jpg).get
    val ref = imageIoDecode(jpg)
    assert(mine.width == w && mine.height == h && mine.components == 1)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (mine.pixels(y * w + x) & 0xff)))
    assert(maxDiff <= 2, s"maxDiff $maxDiff")
  }

  test("my decoder reads ImageIO-encoded RGB JPEGs (chroma-subsampled)") {
    val (w, h) = (33, 25) // non-multiples of 8 exercise edge MCUs
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradient: chroma-upsampling flavor differences stay small
      val r = (40 + x * 4) % 256; val g = (60 + y * 5) % 256; val b = (30 + x * 2 + y * 2) % 256
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val jpg = imageIoEncode(src, 0.95f)
    val mine = Jpeg.decode(jpg).get
    val ref = imageIoDecode(jpg)
    assert(mine.width == w && mine.height == h && mine.components == 3)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val mv = mine.pixels((y * w + x) * 3 + c) & 0xff
      val d = math.abs(rv - mv)
      sumDiff += d; maxDiff = math.max(maxDiff, d)
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 3.0, s"meanDiff $meanDiff")
    assert(maxDiff <= 48, s"maxDiff $maxDiff") // upsampling flavor at edges
  }

  test("restart markers (DRI + RSTn): my decoder and ImageIO both resync") {
    val (w, h) = (64, 24) // 24 blocks; interval 5 → RST0..RST3 cycle used
    val px = blockConstant(w, h, 91)
    val jpg = Jpeg.encodeGray(w, h, px, qStep = 8, restartInterval = 5)
    // the stream really contains restart markers
    assert((0 until jpg.length - 1).exists(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) >= 0xd0 && (jpg(i + 1) & 0xff) <= 0xd7))
    val mine = Jpeg.decode(jpg).get
    assert(java.util.Arrays.equals(mine.pixels, px))
    val ref = imageIoDecode(jpg)
    for (y <- 0 until h; x <- 0 until w)
      assert(ref.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xff), s"($x,$y)")
  }

  test("garbage, truncation, and malformed scan headers fail closed") {
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode(null).isEmpty)
    val good = Jpeg.encodeGray(16, 16, blockConstant(16, 16, 5))
    assert(Jpeg.decode(good).nonEmpty)
    assert(Jpeg.decode(java.util.Arrays.copyOf(good, good.length - 12)).isEmpty)
    // flip SOF0 to SOF2: the baseline SOS header (Ss=0, Se=63) is not a
    // legal progressive scan header (a DC scan must have Se=0) → None
    val prog = good.clone()
    val sof = prog.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  // ---- progressive (SOF2) ------------------------------------------------

  private def imageIoEncodeProgressive(img: java.awt.image.BufferedImage,
                                       quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  test("encodeGrayProgressive(qStep=8) round-trips block-constant images EXACTLY") {
    for ((w, h, seed) <- Seq((8, 8, 3), (17, 9, 40), (24, 16, 200), (5, 21, 129))) {
      val px = blockConstant(w, h, seed)
      val jpg = Jpeg.encodeGrayProgressive(w, h, px)
      // the stream is really progressive and really multi-scan
      assert(jpg.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) >= 0)
      assert(jpg.sliding(2).count(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xda) == 3)
      val dec = Jpeg.decode(jpg).get
      assert(dec.width == w && dec.height == h && dec.components == 1)
      assert(java.util.Arrays.equals(dec.pixels, px), s"($w,$h,$seed)")
    }
  }

  test("ImageIO decodes my progressive encoder's block-constant output to the planted pixels") {
    val (w, h, seed) = (20, 13, 77)
    val px = blockConstant(w, h, seed)
    val img = imageIoDecode(Jpeg.encodeGrayProgressive(w, h, px))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xff), s"($x,$y)")
  }

  test("progressive and baseline paths decode identical coefficients to identical pixels") {
    val rng = new scala.util.Random(11)
    val (w, h) = (37, 22)
    val px = Array.tabulate(w * h)(_ => rng.nextInt(256).toByte)
    val seqDec = Jpeg.decode(Jpeg.encodeGray(w, h, px, qStep = 3)).get
    val progDec = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, px, qStep = 3)).get
    // both encoders quantize the same FDCT output, so the decoded pixels
    // must match bit-for-bit if the multi-scan reassembly is correct
    assert(java.util.Arrays.equals(seqDec.pixels, progDec.pixels))
  }

  test("my decoder reads ImageIO-encoded progressive GRAY JPEGs (AC refinement for real)") {
    val (w, h) = (45, 30)
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rng = new scala.util.Random(23)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 5 + y * 9 + rng.nextInt(32)) % 256)
    val jpg = imageIoEncodeProgressive(src, 0.9f)
    assert(jpg.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) >= 0, "writer did not emit SOF2")
    val mine = Jpeg.decode(jpg).get
    val ref = imageIoDecode(jpg)
    assert(mine.width == w && mine.height == h && mine.components == 1)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (mine.pixels(y * w + x) & 0xff)))
    assert(maxDiff <= 2, s"maxDiff $maxDiff")
  }

  test("my decoder reads ImageIO-encoded progressive RGB JPEGs (interleaved DC scan + subsampling)") {
    val (w, h) = (33, 25)
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (40 + x * 4) % 256; val g = (60 + y * 5) % 256; val b = (30 + x * 2 + y * 2) % 256
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val jpg = imageIoEncodeProgressive(src, 0.95f)
    assert(jpg.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) >= 0, "writer did not emit SOF2")
    val mine = Jpeg.decode(jpg).get
    val ref = imageIoDecode(jpg)
    assert(mine.width == w && mine.height == h && mine.components == 3)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val mv = mine.pixels((y * w + x) * 3 + c) & 0xff
      val d = math.abs(rv - mv)
      sumDiff += d; maxDiff = math.max(maxDiff, d)
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 3.0, s"meanDiff $meanDiff")
    assert(maxDiff <= 48, s"maxDiff $maxDiff")
  }

  test("truncated progressive streams fail closed at every cut depth") {
    val px = blockConstant(24, 16, 9)
    val jpg = Jpeg.encodeGrayProgressive(24, 16, px)
    for (cut <- Seq(jpg.length - 3, jpg.length * 3 / 4, jpg.length / 2, 20))
      assert(Jpeg.decode(java.util.Arrays.copyOf(jpg, cut)).isEmpty, s"cut $cut")
  }

  test("FF fill bytes before markers are spec-legal (T.81 B.1.1.2) and skipped") {
    val px = blockConstant(16, 16, 21)
    val jpg = Jpeg.encodeGray(16, 16, px)
    val want = Jpeg.decode(jpg).get.pixels.toSeq
    // pad the DQT marker (immediately after SOI at offset 2) with fills
    val padded = jpg.take(2) ++ Array.fill(3)(0xff.toByte) ++ jpg.drop(2)
    val got = Jpeg.decode(padded)
    assert(got.nonEmpty, "fill-padded stream must decode")
    assert(got.get.pixels.toSeq == want)
    // and before an RSTn inside the entropy stream
    val rst = Jpeg.encodeGray(24, 24, blockConstant(24, 24, 5), restartInterval = 2)
    val wantRst = Jpeg.decode(rst).get.pixels.toSeq
    val ri = rst.indexWhere(_ == 0xff.toByte, 200) match {
      case -1 => fail("no marker found"); -1
      case _ =>
        // find the first FF D0..D7 pair
        (0 until rst.length - 1).find(i =>
          (rst(i) & 0xff) == 0xff && (rst(i + 1) & 0xff) >= 0xd0 && (rst(i + 1) & 0xff) <= 0xd7).get
    }
    val rstPadded = rst.take(ri) ++ Array.fill(2)(0xff.toByte) ++ rst.drop(ri)
    val gotRst = Jpeg.decode(rstPadded)
    assert(gotRst.nonEmpty, "fill bytes before RSTn must decode")
    assert(gotRst.get.pixels.toSeq == wantRst)
  }

  test("encodeGray(qStep=1) on a basis-matched extreme block clamps instead of throwing") {
    // alternating columns at max contrast put the quantized AC coefficient
    // past Annex-K category 10 at qStep 1 — the encoder must clamp to
    // ±1023 and still emit a stream both decoders accept
    val w = 16; val h = 16
    val px = Array.tabulate(w * h)(k => if (k % 2 == 0) 0.toByte else 255.toByte)
    for (q <- Seq(1, 2, 3)) {
      val jpg = Jpeg.encodeGray(w, h, px, qStep = q)
      val mine = Jpeg.decode(jpg)
      assert(mine.nonEmpty, s"qStep $q own decode")
      val io = imageIoDecode(jpg)
      assert(io != null && io.getWidth == w && io.getHeight == h, s"qStep $q ImageIO")
      val prog = Jpeg.encodeGrayProgressive(w, h, px, qStep = q)
      assert(Jpeg.decode(prog).nonEmpty, s"qStep $q progressive")
    }
  }
}
