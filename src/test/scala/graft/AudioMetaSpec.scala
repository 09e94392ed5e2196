package graft

import graft.ops.AudioMeta
import org.scalatest.funsuite.AnyFunSuite

/** MP3 / FLAC / Ogg header walks: round trips through the fixture
  * encoders, ID3 skip, >32-bit FLAC totals, >255-byte Ogg lacing, and
  * fail-closed malformation. */
class AudioMetaSpec extends AnyFunSuite {

  test("MP3 frame walk: frames, rate, channels, samples; ID3v2 skipped") {
    val plain = AudioMeta.decodeMp3(AudioMeta.encodeMp3(5, brIdx = 9, srIdx = 0)).get
    assert(plain == AudioMeta.Meta("mp3", 44100, 2, 5, 5 * 1152))
    val tagged = AudioMeta.decodeMp3(AudioMeta.encodeMp3(3, 5, 1, id3Size = 77, stereo = false)).get
    assert(tagged == AudioMeta.Meta("mp3", 48000, 1, 3, 3 * 1152))
  }

  test("FLAC STREAMINFO: 20-bit rate, channels, 36-bit totals") {
    val m = AudioMeta.decodeFlac(AudioMeta.encodeFlac(96000, 6, 8L << 32)).get
    assert(m == AudioMeta.Meta("flac", 96000, 6, -1L, 8L << 32))
    assert(AudioMeta.decodeFlac(AudioMeta.encodeFlac(1048575, 1, 5)).get.sampleRate == 1048575)
  }

  test("Ogg page walk: page count and final granule, lacing over 255") {
    val m = AudioMeta.decodeOgg(AudioMeta.encodeOgg(Seq(30, 700, 12), 123456789L)).get
    assert(m == AudioMeta.Meta("ogg", -1, -1, 3, 123456789L))
  }

  test("malformations fail closed") {
    val mp3 = AudioMeta.encodeMp3(4, 9, 0)
    assert(AudioMeta.decodeMp3(java.util.Arrays.copyOf(mp3, mp3.length - 3)).isEmpty) // torn frame
    val badSync = mp3.clone(); badSync(0) = 0x12
    assert(AudioMeta.decodeMp3(badSync).isEmpty)
    val flac = AudioMeta.encodeFlac(44100, 2, 1000)
    assert(AudioMeta.decodeFlac(java.util.Arrays.copyOf(flac, flac.length - 3)).isEmpty)
    val ogg = AudioMeta.encodeOgg(Seq(10, 20), 55)
    assert(AudioMeta.decodeOgg(java.util.Arrays.copyOf(ogg, ogg.length - 3)).isEmpty)
    assert(AudioMeta.decode(null).isEmpty)
    assert(AudioMeta.decode("random text bytes here".getBytes).isEmpty)
  }
}
