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

  test("garbage, truncation, and progressive scans fail closed") {
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode(null).isEmpty)
    val good = Jpeg.encodeGray(16, 16, blockConstant(16, 16, 5))
    assert(Jpeg.decode(good).nonEmpty)
    assert(Jpeg.decode(java.util.Arrays.copyOf(good, good.length - 12)).isEmpty)
    // flip SOF0 marker to SOF2 (progressive) → out of scope → None
    val prog = good.clone()
    val sof = prog.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }
}
