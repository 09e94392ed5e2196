package graft

import org.apache.spark.sql.functions._
import graft.ops.Image

/** Round-7: PNG pixel decode (S2's last stub closed) + perceptual-hash
  * image dedup. The filter arithmetic is pinned in BOTH directions against
  * hand-computed bytes so a mirrored encoder/decoder bug cannot cancel in
  * the round-trip (or the m7 oracle) gate. */
class ImageSpec extends SparkSpec {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("unfilter: hand-computed reconstruction for all five filter types") {
    // 2x2 grayscale, pixel rows [10,20] / [30,50]; row 0 always filter 0.
    def dec(f: Array[Byte]) = Image.unfilter(f, 2, 2, 1).get.map(_ & 0xff).toSeq
    assert(dec(b(0, 10, 20, 0, 30, 50)) == Seq(10, 20, 30, 50), "None")
    // Sub on row 0: f = [10, 20-10]; Up on row 1: f = [30-10, 50-20]
    assert(dec(b(1, 10, 10, 2, 20, 30)) == Seq(10, 20, 30, 50), "Sub+Up")
    // Average row 1: x=0 pred=(0+10)>>1=5 -> 25; x=1 pred=(30+20)>>1=25 -> 25
    assert(dec(b(0, 10, 20, 3, 25, 25)) == Seq(10, 20, 30, 50), "Average")
    // Paeth row 1: x=0 (a=0,b=10,c=0 -> b) 30-10=20; x=1 (a=30,b=20,c=10
    // -> p=40, pa=10 pb=20 pc=30 -> a) 50-30=20
    assert(dec(b(0, 10, 20, 4, 20, 20)) == Seq(10, 20, 30, 50), "Paeth")
    // modular wraparound: Sub with 100-200 = -100 -> 156; recon 156+200 & 0xff
    assert(Image.unfilter(b(1, 200, 156), 2, 1, 1).get.map(_ & 0xff).toSeq ==
      Seq(200, 100), "Sub mod-256")
    // filter type > 4 fails closed
    assert(Image.unfilter(b(5, 1, 2), 2, 1, 1).isEmpty)
  }

  test("filterLine: hand-computed encode direction matches the same bytes") {
    val raw = b(10, 20, 30, 50) // 2x2 gray
    assert(Image.filterLine(raw, 0, 2, 1, 1).map(_ & 0xff).toSeq == Seq(10, 10), "Sub")
    assert(Image.filterLine(raw, 1, 2, 1, 2).map(_ & 0xff).toSeq == Seq(20, 30), "Up")
    assert(Image.filterLine(raw, 1, 2, 1, 3).map(_ & 0xff).toSeq == Seq(25, 25), "Average")
    assert(Image.filterLine(raw, 1, 2, 1, 4).map(_ & 0xff).toSeq == Seq(20, 20), "Paeth")
    // multi-channel: RGB left-neighbor is 3 bytes back, not 1
    val rgb = b(5, 6, 7, 105, 56, 207)
    assert(Image.filterLine(rgb, 0, 6, 3, 1).map(_ & 0xff).toSeq ==
      Seq(5, 6, 7, 100, 50, 200), "Sub bpp=3")
  }

  test("encode/decode round trip across color types, filters, and sizes") {
    for (ct <- Seq(0, 2, 3, 4, 6); w <- Seq(1, 3, 8); h <- Seq(1, 5)) {
      val ch = ct match { case 0 | 3 => 1; case 4 => 2; case 2 => 3; case 6 => 4 }
      val raw = Array.tabulate(w * h * ch) { i =>
        (if (ct == 3) i * 11 % 16 else i * 37 + 13).toByte
      }
      val pal = if (ct == 3) Array.tabulate(48)(k => (k * 29).toByte) else null
      val png = Image.encodePng(w, h, ct, raw, y => (y + w) % 5, pal)
      val img = Image.decodePng(png).getOrElse(fail(s"decode failed ct=$ct w=$w h=$h"))
      assert(img.width == w && img.height == h && img.colorType == ct)
      assert(img.raw.toSeq == raw.toSeq, s"pixels ct=$ct w=$w h=$h")
    }
  }

  test("decode fails closed: corruption, truncation, bomb dims, bad palette index") {
    val png = Image.encodePng(4, 3, 0, Array.tabulate(12)(_.toByte))
    assert(Image.decodePng(png).isDefined)
    for (pos <- 8 until png.length) { // every post-signature byte is load-bearing
      val c = png.clone(); c(pos) = (c(pos) ^ 0xff).toByte
      assert(Image.decodePng(c).isEmpty, s"flip at $pos must fail")
    }
    assert(Image.decodePng(png.dropRight(1)).isEmpty, "truncated")
    assert(Image.decodePng(Array.emptyByteArray).isEmpty)
    assert(Image.decodePng(null).isEmpty)
    // declared dims exceeding maxBytes are rejected before allocation
    assert(Image.decodePng(png, maxBytes = 10).isEmpty, "bomb guard")
    // palette index past PLTE length: 2-entry palette, index 5
    val palPng = Image.encodePng(1, 1, 3, b(5), palette = b(1, 2, 3, 4, 5, 6))
    assert(Image.decodePng(palPng).isEmpty, "out-of-range palette index")
  }

  test("toGray: luma per color type; RGB r=g=b equals the gray value exactly") {
    val g0 = Image.decodePng(Image.encodePng(2, 1, 0, b(100, 200))).get
    assert(Image.toGray(g0).toSeq == Seq(100, 200))
    val rgb = Image.decodePng(Image.encodePng(1, 1, 2, b(100, 150, 200))).get
    assert(Image.toGray(rgb).toSeq == Seq((299 * 100 + 587 * 150 + 114 * 200) / 1000))
    val same = Image.decodePng(Image.encodePng(1, 1, 2, b(137, 137, 137))).get
    assert(Image.toGray(same).toSeq == Seq(137))
    val ga = Image.decodePng(Image.encodePng(1, 1, 4, b(77, 255))).get
    assert(Image.toGray(ga).toSeq == Seq(77), "gray+alpha ignores alpha")
    val pal = Image.decodePng(Image.encodePng(1, 1, 3, b(1), palette = b(0, 0, 0, 10, 20, 30))).get
    assert(Image.toGray(pal).toSeq == Seq((299 * 10 + 587 * 20 + 114 * 30) / 1000))
  }

  test("boxResize: identity, exact 2x downscale means, clamped upscale") {
    val g = Array(10, 20, 30, 40) // 2x2
    assert(Image.boxResize(g, 2, 2, 2, 2).toSeq == g.toSeq, "identity")
    assert(Image.boxResize(g, 2, 2, 1, 1).toSeq == Seq((10 + 20 + 30 + 40) / 4), "2x box mean")
    // floor mean: [1,2] -> floor(3/2) = 1
    assert(Image.boxResize(Array(1, 2), 2, 1, 1, 1).toSeq == Seq(1), "floor")
    // upscale 1x1 -> 2x2 clamps every cell to the one source pixel
    assert(Image.boxResize(Array(9), 1, 1, 2, 2).toSeq == Seq(9, 9, 9, 9), "upscale clamp")
  }

  test("dHash/aHash: hand-computed bits on native-grid images") {
    // 9x8 with a single increasing row pattern: p(x,y) = x -> all dHash bits 1
    val inc = Array.tabulate(72)(i => i % 9)
    assert(Image.dHashBits(inc, 9, 8) == "1" * 64)
    val dec = Array.tabulate(72)(i => 8 - i % 9)
    assert(Image.dHashBits(dec, 9, 8) == "0" * 64)
    // aHash 8x8: half zeros half 200s -> mean 100, bits = the 200 cells
    val half = Array.tabulate(64)(i => if (i < 32) 0 else 200)
    assert(Image.aHashBits(half, 8, 8) == "0" * 32 + "1" * 32)
  }

  test("imageNearDupPairs: planted Hamming neighbors through the real decode") {
    import spark.implicits._
    // 3 images: A, B = A with one gradient step flipped (hamming 1),
    // C = inverted gradient (hamming 64) — only (A, B) must pair
    def gradImg(flip: Boolean, invert: Boolean): Array[Byte] = {
      val gray = new Array[Int](72)
      for (y <- 0 until 8) {
        gray(y * 9) = 128
        for (x <- 0 until 8) {
          val up = (if (invert) x % 2 == 1 else x % 2 == 0) ^ (flip && y == 0 && x == 0)
          gray(y * 9 + x + 1) = gray(y * 9 + x) + (if (up) 1 else -1)
        }
      }
      Image.encodePng(9, 8, 0, gray.map(_.toByte), y => y % 5)
    }
    val df = Seq(
      (1L, gradImg(flip = false, invert = false)),
      (2L, gradImg(flip = true, invert = false)),
      (3L, gradImg(flip = false, invert = true)),
      (4L, Array[Byte](1, 2, 3)) // undecodable: must drop out, not poison
    ).toDF("id", "payload")
    val sigs = Image.dhashStage(df, "payload", "sig")
    val pairs = Image.imageNearDupPairs(sigs, "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L)))
  }
}
