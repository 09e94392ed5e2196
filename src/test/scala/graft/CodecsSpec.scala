package graft

import graft.ops.Codecs
import org.scalatest.funsuite.AnyFunSuite

/** zstd / LZ4-frame / snappy-framed member decode: round trips, the
  * bomb bound, and the corruption-detectability matrix the query gates
  * rely on (truncation must fail all three; bit flips must fail where
  * the format carries a checksum). */
class CodecsSpec extends AnyFunSuite {

  private val text = ("the quick brown fox " * 200).getBytes("UTF-8")

  private val codecs: Seq[(String, Array[Byte] => Array[Byte], Array[Byte] => Option[Array[Byte]])] = Seq(
    ("zstd", Codecs.zstd(_, 3), Codecs.unzstd(_, 1 << 26)),
    ("lz4", Codecs.lz4 _, Codecs.unlz4(_, 1 << 26)),
    ("snappy", Codecs.snappy _, Codecs.unsnappy(_, 1 << 26)),
    ("xz", Codecs.xz(_, 3), Codecs.unxz(_, 1 << 26)))

  test("round trip all three codecs") {
    for ((name, enc, dec) <- codecs) {
      val c = enc(text)
      assert(c.length < text.length, s"$name should compress")
      assert(dec(c).exists(java.util.Arrays.equals(_, text)), name)
    }
  }

  test("truncation quarantines for all three") {
    for ((name, enc, dec) <- codecs; cut <- Seq(4, 9, 20)) {
      val c = enc(text)
      assert(dec(java.util.Arrays.copyOf(c, c.length - cut)).isEmpty, s"$name cut $cut")
    }
  }

  test("mid-stream bit flips are caught where the format checksums") {
    for ((name, enc, dec) <- codecs) {
      val c = enc(text)
      val bad = c.clone()
      val p = c.length / 2
      bad(p) = (bad(p) ^ 0x10).toByte
      val out = dec(bad)
      assert(out.isEmpty || !java.util.Arrays.equals(out.get, text),
        s"$name must not silently return the original after a flip")
      // lz4 (content checksum on), snappy (per-chunk CRC), and xz
      // (per-block CRC64) must REJECT
      if (name == "lz4" || name == "snappy" || name == "xz")
        assert(out.isEmpty, s"$name checksum")
    }
  }

  test("the decompression-bomb bound quarantines, garbage fails closed") {
    val big = new Array[Byte](1 << 20) // 1 MiB of zeros compresses tiny
    for ((name, enc, dec0) <- codecs) {
      val c = enc(big)
      assert(c.length < (1 << 16), name)
      val tight = name match {
        case "zstd" => Codecs.unzstd(c, maxOut = 1 << 10)
        case "lz4" => Codecs.unlz4(c, maxOut = 1 << 10)
        case "xz" => Codecs.unxz(c, maxOut = 1 << 10)
        case _ => Codecs.unsnappy(c, maxOut = 1 << 10)
      }
      assert(tight.isEmpty, s"$name bomb bound")
      assert(dec0("not compressed at all, just text".getBytes).isEmpty, name)
      assert(dec0(null).isEmpty, name)
    }
  }
}
