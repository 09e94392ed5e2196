package graft

import graft.ops.Webp
import org.scalatest.funsuite.AnyFunSuite

class WebpSpec extends AnyFunSuite {

  test("all three variants round trip, including 14-bit maxima") {
    for ((v, w, h) <- Seq(("vp8", 1, 1), ("vp8", 640, 480), ("vp8", 16383, 16383),
                          ("vp8l", 1, 1), ("vp8l", 16384, 16384), ("vp8l", 333, 77),
                          ("vp8x", 1, 1), ("vp8x", 99999, 12345))) {
      val d = Webp.dims(Webp.encode(v, w, h))
      assert(d.contains((v, w, h)), s"$v $w x $h -> $d")
    }
  }

  test("garbage, truncation, and a wrong start code fail to None") {
    assert(Webp.dims(null).isEmpty)
    assert(Webp.dims(Array.emptyByteArray).isEmpty)
    assert(Webp.dims("RIFFxxxxWAVE".getBytes ++ new Array[Byte](20)).isEmpty)
    val good = Webp.encode("vp8", 64, 48)
    assert(Webp.dims(java.util.Arrays.copyOf(good, 22)).isEmpty)
    val bad = good.clone(); bad(23) = 0x00 // start code
    assert(Webp.dims(bad).isEmpty)
    val badL = Webp.encode("vp8l", 10, 10); badL(20) = 0x30
    assert(Webp.dims(badL).isEmpty)
  }
}
