package graft

import graft.ops.Audio
import org.scalatest.funsuite.AnyFunSuite

/** G.711 µ-law/A-law expansion differentials against the JDK's
  * INDEPENDENT javax.sound codecs, plus the WAV integration (format
  * tags 7/6). */
class G711Spec extends AnyFunSuite {

  /** Expand all 256 codes through javax.sound's converter. */
  private def jdkExpand(encoding: javax.sound.sampled.AudioFormat.Encoding): Array[Int] = {
    import javax.sound.sampled._
    val src = new AudioFormat(encoding, 8000f, 8, 1, 1, 8000f, false)
    val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(codes), src, 256)
    val conv = AudioSystem.getAudioInputStream(dst, in)
    val out = conv.readAllBytes()
    assert(out.length == 512)
    Array.tabulate(256)(i => ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt)
  }

  test("differential: ulawToLinear matches the JDK codec on all 256 codes") {
    val ref = jdkExpand(javax.sound.sampled.AudioFormat.Encoding.ULAW)
    for (b <- 0 until 256)
      assert(Audio.ulawToLinear(b) == ref(b), s"code $b: mine=${Audio.ulawToLinear(b)} jdk=${ref(b)}")
  }

  test("differential: alawToLinear matches the JDK codec on all 256 codes") {
    val ref = jdkExpand(javax.sound.sampled.AudioFormat.Encoding.ALAW)
    for (b <- 0 until 256)
      assert(Audio.alawToLinear(b) == ref(b), s"code $b: mine=${Audio.alawToLinear(b)} jdk=${ref(b)}")
  }

  test("spec landmarks: zero codes, maxima, sign symmetry") {
    assert(Audio.ulawToLinear(0xff) == 0)             // µ-law positive zero
    assert(Audio.ulawToLinear(0x7f) == 0)             // µ-law negative zero is also 0
    assert(Audio.ulawToLinear(0x80) == 32124)         // positive max
    assert(Audio.ulawToLinear(0x00) == -32124)        // negative max
    assert(Audio.alawToLinear(0xd5) == 8)             // A-law smallest positive
    assert(Audio.alawToLinear(0x55) == -8)
    assert(Audio.alawToLinear(0xaa) == 32256)         // A-law positive max
    assert(Audio.alawToLinear(0x2a) == -32256)
    for (b <- 0 until 128) {
      assert(Audio.ulawToLinear(b) == -Audio.ulawToLinear(b | 0x80))
      assert(Audio.alawToLinear(b) == -Audio.alawToLinear(b | 0x80))
    }
  }

  test("WAV format tags 6/7 decode through decodeWavPcm with exact features") {
    for ((tag, expand) <- Seq(7 -> Audio.ulawToLinear _, 6 -> Audio.alawToLinear _)) {
      val n = 64
      val codes = Array.tabulate(n)(k => (k * 29 + 3) % 256)
      val out = new java.io.ByteArrayOutputStream()
      def s4(t: String): Unit = out.write(t.getBytes("US-ASCII"))
      def le(v: Long, len: Int): Unit =
        (0 until len).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      s4("RIFF"); le(36 + n, 4); s4("WAVE")
      s4("fmt "); le(16, 4); le(tag, 2); le(1, 2); le(8000, 4); le(8000, 4); le(1, 2); le(8, 2)
      s4("data"); le(n, 4); codes.foreach(out.write)
      val f = Audio.decodeWavPcm(out.toByteArray).get
      val lin = codes.map(expand)
      assert(f.bits == 8 && f.channels == 1 && f.nFrames == n)
      assert(f.peak == lin.map(math.abs).max)
      assert(f.sumSq == lin.map(v => v.toLong * v).sum)
      assert(f.zeroCross == (1 until n).count(k => (lin(k - 1) < 0) != (lin(k) < 0)))
      assert(f.silent == lin.count(v => math.abs(v) < 50))
    }
    // a 16-bit G.711 tag is malformed
    val bad = new java.io.ByteArrayOutputStream()
    def s4b(t: String): Unit = bad.write(t.getBytes("US-ASCII"))
    def leb(v: Long, len: Int): Unit =
      (0 until len).foreach(i => bad.write(((v >> (8 * i)) & 0xff).toInt))
    s4b("RIFF"); leb(36 + 4, 4); s4b("WAVE")
    s4b("fmt "); leb(16, 4); leb(7, 2); leb(1, 2); leb(8000, 4); leb(16000, 4); leb(2, 2); leb(16, 2)
    s4b("data"); leb(4, 4); leb(0, 4)
    assert(Audio.decodeWavPcm(bad.toByteArray).isEmpty)
  }
}
