package graft

import graft.ops.{AudioMeta, Bzip2, Zip}
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 regressions for the four ADVICE_r8 decoder-robustness items:
  * 7z short-read torn-buffer acceptance, ZIP local-header Int overflow,
  * MP3 ID3v1/APE trailer quarantine, bzip2 trailing-garbage acceptance. */
class Round9Spec extends AnyFunSuite {

  // --- ADVICE item 2: Zip.extract dataOff overflow --------------------------
  test("zip: hostile local-header offset near Int.MaxValue quarantines, not AIOOBE") {
    val bytes = Array.fill[Byte](4096)(0)
    // entry whose central-directory record claims a local header far past the
    // payload; extract must return None through the Long-safe bounds guard
    val e = Zip.Entry("evil", method = 8, flags = 0, crc = 0L,
      compSize = 100, uncompSize = 100, localOff = Int.MaxValue - 10)
    assert(Zip.extract(bytes, e).isEmpty)
    val e2 = e.copy(localOff = bytes.length - 31) // header straddles the end
    assert(Zip.extract(bytes, e2).isEmpty)
  }

  // --- ADVICE item 3: MP3 end-of-stream tags --------------------------------
  test("mp3: ID3v1 'TAG' 128-byte trailer after the last frame is tolerated") {
    val clean = AudioMeta.encodeMp3(5, brIdx = 9, srIdx = 0)
    val base = AudioMeta.decodeMp3(clean).get
    val tag = new Array[Byte](128)
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val got = AudioMeta.decodeMp3(clean ++ tag)
    assert(got.nonEmpty, "TAG trailer must not quarantine a valid stream")
    assert(got.get.frames == base.frames && got.get.sampleRate == base.sampleRate)
  }

  test("mp3: APEv2 header block trailer (optionally followed by ID3v1) is tolerated") {
    val clean = AudioMeta.encodeMp3(3, brIdx = 9, srIdx = 0)
    val base = AudioMeta.decodeMp3(clean).get
    // minimal APEv2: 32-byte header, zero items => size field counts footer only (32)
    def ape(size: Int): Array[Byte] = {
      val a = new Array[Byte](32 + size)
      "APETAGEX".getBytes.copyToArray(a)
      a(12) = (size & 0xff).toByte; a(13) = ((size >> 8) & 0xff).toByte
      "APETAGEX".getBytes.copyToArray(a, size) // footer magic at the tail
      a
    }
    val withApe = AudioMeta.decodeMp3(clean ++ ape(32))
    assert(withApe.nonEmpty && withApe.get.frames == base.frames)
    val tag = new Array[Byte](128); tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val withBoth = AudioMeta.decodeMp3(clean ++ ape(32) ++ tag)
    assert(withBoth.nonEmpty && withBoth.get.frames == base.frames)
  }

  test("mp3: unrecognized trailing bytes still quarantine the whole payload") {
    val clean = AudioMeta.encodeMp3(4, brIdx = 9, srIdx = 0)
    assert(AudioMeta.decodeMp3(clean ++ Array[Byte]('J', 'U', 'N', 'K', 0, 0)).isEmpty)
    // a 'TAG' trailer that is NOT exactly 128 bytes is not ID3v1
    val short = new Array[Byte](64); short(0) = 'T'; short(1) = 'A'; short(2) = 'G'
    assert(AudioMeta.decodeMp3(clean ++ short).isEmpty)
  }

  // --- ADVICE item 4: bzip2 whole-payload strictness ------------------------
  test("bzip2: trailing garbage after the final stream quarantines; zero padding ok") {
    val enc = Bzip2.encode("strict tail contract".getBytes("UTF-8"))
    assert(Bzip2.decode(enc).nonEmpty)
    assert(Bzip2.decode(enc ++ Array[Byte](0, 0, 0)).nonEmpty, "zero padding tolerated")
    assert(Bzip2.decode(enc ++ "garbage".getBytes).isEmpty, "non-zero tail must fail")
    assert(Bzip2.decode(enc ++ Array[Byte]('B', 'Z')).isEmpty, "torn next stream must fail")
  }
}
