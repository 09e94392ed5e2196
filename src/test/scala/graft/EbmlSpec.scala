package graft

import graft.ops.Ebml
import org.scalatest.funsuite.AnyFunSuite

/** EBML/WebM metadata walk: round trip, defaulted TimestampScale, Void
  * skipping, unknown-size and truncation fail-closed. */
class EbmlSpec extends AnyFunSuite {

  test("round trip: doc type, scaled duration, video dims, audio params") {
    val webm = Ebml.encodeWebm(durationTicks = 12345.0, tsScale = 1000000L,
      vw = 1920, vh = 1080, audioRate = 48000.0, channels = 2)
    val m = Ebml.decode(webm).get
    assert(m.docType == "webm" && m.timestampScale == 1000000L)
    assert(m.durationMs == 12345L)
    assert(m.videoW == 1920 && m.videoH == 1080)
    assert(m.audioRate == 48000 && m.audioChannels == 2)
    // non-default scale: 1 ms ticks → duration already in ms
    val m2 = Ebml.decode(Ebml.encodeWebm(500.0, 1000000L * 2, 64, 48, 8000.0, 1)).get
    assert(m2.durationMs == 1000L && m2.audioChannels == 1)
  }

  test("malformations fail closed; garbage is not EBML") {
    val webm = Ebml.encodeWebm(100.0, 1000000L, 10, 10, 44100.0, 2)
    assert(Ebml.decode(java.util.Arrays.copyOf(webm, webm.length - 5)).isEmpty)
    assert(Ebml.decode(java.util.Arrays.copyOf(webm, 6)).isEmpty)
    assert(Ebml.decode(null).isEmpty)
    assert(Ebml.decode("this is not a webm file at all".getBytes).isEmpty)
    // unknown-size vint (all ones) fails closed
    val bad = webm.clone()
    // the EBML header's size vint starts right after the 4-byte ID
    bad(4) = 0x7f.toByte; bad(5) = 0xff.toByte
    assert(Ebml.decode(bad).isEmpty)
  }
}
