package graft

import graft.ops.{Avi, Jpeg}
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-AVI container walk + per-frame JPEG decode: round trips through
  * the fixture encoder, both codec paths (baseline and progressive
  * frames), and both quarantine granularities (container-level None,
  * frame-level null). */
class AviSpec extends AnyFunSuite {

  private def blockConstant(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      (((x / 8) * 7 + (y / 8) * 11 + seed) % 256).toByte
    }

  test("round trip: planted frames decode to exact per-frame stats") {
    val (w, h) = (20, 12)
    val frames = (0 until 3).map { f =>
      val px = blockConstant(w, h, 40 + 17 * f)
      if (f % 2 == 0) Jpeg.encodeGray(w, h, px) else Jpeg.encodeGrayProgressive(w, h, px)
    }
    val avi = Avi.encodeMjpegAvi(w, h, 33367, frames)
    assert(new String(avi, 0, 4) == "RIFF" && new String(avi, 8, 4) == "AVI ")
    val m = Avi.decodeMjpeg(avi).get
    assert(m.usPerFrame == 33367 && m.declaredFrames == 3 && m.width == w && m.height == h)
    assert(m.frames.length == 3)
    for (f <- 0 until 3) {
      val px = blockConstant(w, h, 40 + 17 * f)
      val expSum = px.map(_ & 0xff).map(_.toLong).sum
      val fr = m.frames(f)
      assert(fr.ok && fr.width == w && fr.height == h)
      assert(fr.pixelSum == expSum, s"frame $f")
      assert(fr.grayMid == (px((h / 2) * w + w / 2) & 0xff))
    }
  }

  test("container-level malformations fail to None") {
    val (w, h) = (16, 8)
    val frames = Seq(Jpeg.encodeGray(w, h, blockConstant(w, h, 5)))
    val avi = Avi.encodeMjpegAvi(w, h, 40000, frames)
    assert(Avi.decodeMjpeg(avi).nonEmpty)
    assert(Avi.decodeMjpeg(java.util.Arrays.copyOf(avi, avi.length - 8)).isEmpty)
    assert(Avi.decodeMjpeg(java.util.Arrays.copyOf(avi, 11)).isEmpty)
    assert(Avi.decodeMjpeg(null).isEmpty)
    // flip the strh handler to a non-MJPG codec → out of scope → None
    val xvid = avi.clone()
    val i = xvid.indexOfSlice("vidsMJPG".getBytes)
    assert(i > 0)
    System.arraycopy("XVID".getBytes, 0, xvid, i + 4, 4)
    assert(Avi.decodeMjpeg(xvid).isEmpty)
  }

  test("a corrupt frame quarantines at frame granularity, not the container") {
    val (w, h) = (24, 16)
    val good = (0 until 3).map(f => Jpeg.encodeGray(w, h, blockConstant(w, h, 9 + f)))
    val bad = good.updated(1, java.util.Arrays.copyOf(good(1), good(1).length - 8))
    val m = Avi.decodeMjpeg(Avi.encodeMjpegAvi(w, h, 40000, bad)).get
    assert(m.frames.length == 3)
    assert(m.frames(0).ok && !m.frames(1).ok && m.frames(2).ok)
    assert(m.frames(2).pixelSum == blockConstant(w, h, 11).map(_ & 0xff).map(_.toLong).sum)
  }

  test("frames whose dims disagree with avih are quarantined") {
    val (w, h) = (16, 16)
    val wrong = Jpeg.encodeGray(8, 8, blockConstant(8, 8, 3))
    val m = Avi.decodeMjpeg(Avi.encodeMjpegAvi(w, h, 40000, Seq(wrong))).get
    assert(m.frames.length == 1 && !m.frames.head.ok)
  }

  test("a 100-frame clip decodes whole — movi children never hit the structural hop cap") {
    val (w, h) = (8, 8)
    val frame = Jpeg.encodeGray(w, h, blockConstant(w, h, 1))
    val m = Avi.decodeMjpeg(Avi.encodeMjpegAvi(w, h, 33333, Seq.fill(100)(frame))).get
    assert(m.frames.length == 100 && m.frames.forall(_.ok))
    // and the frame cap still binds
    assert(Avi.decodeMjpeg(
      Avi.encodeMjpegAvi(w, h, 33333, Seq.fill(257)(frame))).isEmpty)
  }

  test("a valid container with an empty movi yields meta with zero frames") {
    val m = Avi.decodeMjpeg(Avi.encodeMjpegAvi(8, 8, 40000, Seq.empty)).get
    assert(m.frames.isEmpty && m.width == 8 && m.usPerFrame == 40000)
  }
}
