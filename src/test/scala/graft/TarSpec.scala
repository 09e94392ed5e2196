package graft

import graft.ops.Tar
import org.scalatest.funsuite.AnyFunSuite

/** ustar shard walk: round trip through the fixture encoder, checksum
  * enforcement, torn-shard quarantine, and a differential against the
  * system GNU tar (an independent implementation, the ImageIO
  * discipline). */
class TarSpec extends AnyFunSuite {

  private val members = Seq(
    "000001.jpg" -> Array.tabulate(700)(i => (i * 7 % 251).toByte),
    "000001.txt" -> "a caption".getBytes("UTF-8"),
    "000002.jpg" -> Array.tabulate(513)(i => (i % 17).toByte), // crosses a block boundary
    "000002.txt" -> Array.emptyByteArray)                      // zero-size member

  test("round trip: names, sizes, and data spans are exact") {
    val tar = Tar.encodeTar(members)
    assert(tar.length % 512 == 0)
    val ms = Tar.listMembers(tar).get
    assert(ms.map(_.name) == members.map(_._1))
    assert(ms.map(_.size) == members.map(_._2.length))
    for ((m, (_, data)) <- ms.zip(members))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(tar, m.off, m.off + m.size), data))
  }

  test("header corruption fails the shard; data corruption does not") {
    val tar = Tar.encodeTar(members)
    val badHdr = tar.clone(); badHdr(1) = (badHdr(1) ^ 0x01).toByte // name byte → checksum mismatch
    assert(Tar.listMembers(badHdr).isEmpty)
    val badData = tar.clone(); badData(512 + 10) = (badData(512 + 10) ^ 0x01).toByte
    assert(Tar.listMembers(badData).nonEmpty) // member data is not checksummed
    assert(Tar.listMembers(java.util.Arrays.copyOf(tar, tar.length - 600)).isEmpty) // torn
    assert(Tar.listMembers(java.util.Arrays.copyOf(tar, tar.length - 1024)).isEmpty) // no trailer
    assert(Tar.listMembers(null).isEmpty)
    assert(Tar.listMembers(new Array[Byte](1024)).get.isEmpty) // empty archive
  }

  test("differential: system GNU tar lists my shards; I list its") {
    val tarBin = Seq("/bin/tar", "/usr/bin/tar").find(p => new java.io.File(p).exists)
    assume(tarBin.nonEmpty, "no system tar")
    val dir = java.nio.file.Files.createTempDirectory("tarspec").toFile
    try {
      // mine → system tar
      val mine = new java.io.File(dir, "mine.tar")
      java.nio.file.Files.write(mine.toPath, Tar.encodeTar(members))
      val listed = scala.sys.process.Process(Seq(tarBin.get, "-tf", mine.getAbsolutePath)).!!
      assert(listed.split("\n").toSeq == members.map(_._1))
      // system tar (ustar format) → mine
      for ((name, data) <- members.take(2))
        java.nio.file.Files.write(new java.io.File(dir, name).toPath, data)
      val theirs = new java.io.File(dir, "theirs.tar")
      val rc = scala.sys.process.Process(
        Seq(tarBin.get, "--format=ustar", "-cf", theirs.getAbsolutePath,
          members(0)._1, members(1)._1), dir).!
      assert(rc == 0)
      val ms = Tar.listMembers(java.nio.file.Files.readAllBytes(theirs.toPath)).get
      assert(ms.map(_.name) == members.take(2).map(_._1))
      assert(ms.map(_.size) == members.take(2).map(_._2.length))
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }
}
