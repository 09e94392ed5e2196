package graft

import graft.ops.Bzip2
import org.scalatest.funsuite.AnyFunSuite

/** bzip2 codec differentials against the system bzip2 binary (an
  * independent implementation, the GNU-tar/ImageIO discipline), plus
  * round trips and fail-closed malformation. */
class Bzip2Spec extends AnyFunSuite {

  private def samples: Seq[(String, Array[Byte])] = Seq(
    "ascii text" -> ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8"),
    "rle1 runs" -> Array.tabulate(3000)(i => if (i / 300 % 2 == 0) 'a'.toByte else (i % 7).toByte),
    "long runs" -> (Array.fill(700)('x'.toByte) ++ Array.fill(3)('y'.toByte) ++ Array.fill(4)('z'.toByte)),
    "binaryish" -> Array.tabulate(5000)(i => ((i * i * 31 + i * 7) % 253).toByte),
    "single byte" -> Array[Byte](42),
    "all 256" -> Array.tabulate(2048)(i => (i % 256).toByte))

  test("round trip: encode then decode recovers every sample exactly") {
    for ((name, data) <- samples) {
      val enc = Bzip2.encode(data)
      assert(enc.startsWith("BZh1".getBytes.toSeq), name)
      val dec = Bzip2.decode(enc)
      assert(dec.nonEmpty, s"$name: decode failed")
      assert(java.util.Arrays.equals(dec.get, data), name)
    }
  }

  test("differential: the system bunzip2 reads my streams") {
    val bz = Seq("/root/miniconda/bin/bzip2", "/usr/bin/bzip2", "/bin/bzip2")
      .find(p => new java.io.File(p).exists)
    assume(bz.nonEmpty, "no system bzip2")
    for ((name, data) <- samples) {
      val enc = Bzip2.encode(data)
      val p = new ProcessBuilder(bz.get, "-d", "-c").redirectErrorStream(false).start()
      p.getOutputStream.write(enc); p.getOutputStream.close()
      val out = p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0, s"$name: system bunzip2 rejected my stream")
      assert(java.util.Arrays.equals(out, data), name)
    }
  }

  test("differential: I read the system bzip2's streams (its tables, its selectors)") {
    val bz = Seq("/root/miniconda/bin/bzip2", "/usr/bin/bzip2", "/bin/bzip2")
      .find(p => new java.io.File(p).exists)
    assume(bz.nonEmpty, "no system bzip2")
    for ((name, data) <- samples; level <- Seq("-1", "-9")) {
      val p = new ProcessBuilder(bz.get, level, "-c").start()
      p.getOutputStream.write(data); p.getOutputStream.close()
      val enc = p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0)
      val dec = Bzip2.decode(enc)
      assert(dec.nonEmpty, s"$name @$level: my decoder rejected the system stream")
      assert(java.util.Arrays.equals(dec.get, data), s"$name @$level")
    }
  }

  test("multistream: concatenated streams decode end-to-end (the Wikipedia multistream layout)") {
    val parts = Seq("first stream body. ".getBytes, ("x" * 800).getBytes, "third!".getBytes)
    val cat = parts.map(Bzip2.encode).reduce(_ ++ _)
    val dec = Bzip2.decode(cat)
    assert(dec.nonEmpty)
    assert(java.util.Arrays.equals(dec.get, parts.reduce(_ ++ _)))
    // system bzip2 agrees on concatenated streams
    val bz = Seq("/root/miniconda/bin/bzip2", "/usr/bin/bzip2").find(p => new java.io.File(p).exists)
    assume(bz.nonEmpty)
    val p = new ProcessBuilder(bz.get, "-d", "-c").start()
    p.getOutputStream.write(cat); p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    assert(p.waitFor() == 0 && java.util.Arrays.equals(out, parts.reduce(_ ++ _)))
  }

  test("malformations fail closed") {
    val enc = Bzip2.encode("hello bzip2 world, hello again and again".getBytes)
    assert(Bzip2.decode(enc).nonEmpty)
    assert(Bzip2.decode(java.util.Arrays.copyOf(enc, enc.length - 3)).isEmpty) // torn tail
    val badCrc = enc.clone(); badCrc(11) = (badCrc(11) ^ 0x10).toByte // inside block CRC bits
    assert(Bzip2.decode(badCrc).isEmpty)
    val badMagic = enc.clone(); badMagic(3) = '0'
    assert(Bzip2.decode(badMagic).isEmpty)
    assert(Bzip2.decode(null).isEmpty)
    assert(Bzip2.decode("BZh1 garbage that is not a block".getBytes).isEmpty)
  }
}
