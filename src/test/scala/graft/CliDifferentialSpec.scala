package graft

import graft.ops.{Ar, Codecs}
import org.scalatest.funsuite.AnyFunSuite

/** CLI differentials for the round-8 codec/archive walks (the
  * bzip2/GNU-tar discipline): the system binaries are independent
  * implementations — binutils `ar` vs commons-compress, liblzma `xz`
  * vs the pure-Java XZ library, liblz4 `lz4` vs the lz4-java port,
  * libzstd `zstd` vs the zstd-jni binding — so agreement in BOTH
  * directions pins the formats, not one library's self-consistency.
  * Guarded with `assume` so absent binaries skip, never fail. */
class CliDifferentialSpec extends AnyFunSuite {

  import scala.sys.process._

  private def has(bin: String): Boolean =
    try { Process(Seq("which", bin)).!(ProcessLogger(_ => ())) == 0 }
    catch { case _: Exception => false }

  private def tmp(prefix: String, suffix: String, bytes: Array[Byte]): java.io.File = {
    val f = java.io.File.createTempFile(prefix, suffix)
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bytes)
    f
  }

  private val payload = ("the quick brown codec fox " * 120).getBytes("UTF-8")

  private def roundTripViaCli(name: String, compressCmd: java.io.File => Seq[String],
                              decompressCmd: java.io.File => Seq[String],
                              ext: String,
                              myEncode: Array[Byte] => Array[Byte],
                              myDecode: Array[Byte] => Option[Array[Byte]]): Unit = {
    assume(has(name), s"$name binary not present")
    // CLI compresses → my decoder reads
    val plain = tmp("cli_in", ".bin", payload)
    val rc = Process(compressCmd(plain)).!(ProcessLogger(_ => ()))
    assert(rc == 0, s"$name compress failed")
    val compressed = new java.io.File(plain.getPath + ext)
    compressed.deleteOnExit()
    val cliBytes = java.nio.file.Files.readAllBytes(compressed.toPath)
    assert(myDecode(cliBytes).exists(java.util.Arrays.equals(_, payload)),
      s"my decoder must read $name's output")
    // my encoder writes → CLI decompresses
    val mine = tmp("cli_mine", ext, myEncode(payload))
    val rc2 = Process(decompressCmd(mine)).!(ProcessLogger(_ => ()))
    assert(rc2 == 0, s"$name must accept my encoder's output")
    val back = new java.io.File(mine.getPath.stripSuffix(ext))
    back.deleteOnExit()
    assert(java.util.Arrays.equals(java.nio.file.Files.readAllBytes(back.toPath), payload),
      s"$name round trip of my stream must restore the payload")
  }

  test("xz: liblzma CLI and the Java XZ implementation agree both ways") {
    roundTripViaCli("xz",
      f => Seq("xz", "-k", "-f", "-3", f.getPath),
      f => Seq("xz", "-d", "-k", "-f", f.getPath),
      ".xz", b => Codecs.xz(b, 3), b => Codecs.unxz(b))
  }

  test("zstd: libzstd CLI and zstd-jni agree both ways") {
    roundTripViaCli("zstd",
      f => Seq("zstd", "-k", "-f", "-3", f.getPath),
      f => Seq("zstd", "-d", "-k", "-f", f.getPath),
      ".zst", b => Codecs.zstd(b, 3), b => Codecs.unzstd(b))
  }

  test("lz4: liblz4 CLI and the lz4-java port agree both ways") {
    roundTripViaCli("lz4",
      f => Seq("lz4", "-k", "-f", f.getPath, f.getPath + ".lz4"),
      f => Seq("lz4", "-d", "-k", "-f", f.getPath, f.getPath.stripSuffix(".lz4")),
      ".lz4", b => Codecs.lz4(b), b => Codecs.unlz4(b))
  }

  test("ar: binutils and the commons-compress walk agree both ways") {
    assume(has("ar"), "ar binary not present")
    val dir = java.nio.file.Files.createTempDirectory("cli_ar").toFile
    dir.deleteOnExit()
    val m1 = new java.io.File(dir, "alpha.txt")
    val m2 = new java.io.File(dir, "beta.bin")
    java.nio.file.Files.write(m1.toPath, "alpha member".getBytes)
    java.nio.file.Files.write(m2.toPath, Array.tabulate[Byte](64)(i => (i * 7).toByte))
    val arc = new java.io.File(dir, "lib.a")
    // binutils creates → my walk reads
    val rc = Process(Seq("ar", "rc", arc.getPath, m1.getPath, m2.getPath)).!(ProcessLogger(_ => ()))
    assert(rc == 0)
    val ms = Ar.members(java.nio.file.Files.readAllBytes(arc.toPath)).get
    assert(ms.map(_.name) == Seq("alpha.txt", "beta.bin"))
    assert(new String(ms(0).data) == "alpha member")
    assert(java.util.Arrays.equals(ms(1).data, Array.tabulate[Byte](64)(i => (i * 7).toByte)))
    // my encoder writes → binutils lists and extracts
    val mine = new java.io.File(dir, "mine.a")
    java.nio.file.Files.write(mine.toPath,
      Ar.encode(Seq("one.txt" -> "first".getBytes, "two.txt" -> "second".getBytes)))
    val listed = Process(Seq("ar", "t", mine.getPath)).!!.trim.split("\n").toSeq
    assert(listed == Seq("one.txt", "two.txt"))
    // !! appends a trailing newline to the captured stdout
    val extracted = Process(Seq("ar", "p", mine.getPath, "two.txt")).!!.stripLineEnd
    assert(extracted == "second")
  }
}
