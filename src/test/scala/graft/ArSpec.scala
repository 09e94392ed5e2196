package graft

import graft.ops.{Ar, Codecs, Tar, Warc}
import org.scalatest.funsuite.AnyFunSuite

/** Unix ar archive walk + the .deb nesting it exists for: ar →
  * control.tar.gz (gzip+tar) and data.tar.xz (xz+tar), every layer an
  * existing engine codec. */
class ArSpec extends AnyFunSuite {

  test("round trip: names, sizes, content") {
    val ms = Seq("debian-binary" -> "2.0\n".getBytes,
      "control.tar.gz" -> Array.tabulate(40)(_.toByte),
      "data.tar.xz" -> Array.tabulate(25)(i => (i * 3).toByte))
    val a = Ar.encode(ms)
    assert(new String(a, 0, 8) == "!<arch>\n")
    val got = Ar.members(a).get
    assert(got.map(_.name) == ms.map(_._1))
    got.zip(ms).foreach { case (g, (_, w)) =>
      assert(g.size == w.length && java.util.Arrays.equals(g.data, w))
    }
  }

  test("torn archives, garbage, and nulls quarantine; budgets bind") {
    val a = Ar.encode(Seq("m1" -> ("y" * 300).getBytes, "m2" -> "z".getBytes))
    for (cut <- Seq(a.length - 3, a.length / 2, 9))
      assert(Ar.members(java.util.Arrays.copyOf(a, cut)).isEmpty, s"cut $cut")
    assert(Ar.members(null).isEmpty)
    assert(Ar.members("definitely not an ar archive".getBytes).isEmpty)
    val budget = Ar.members(a, maxMemberBytes = 100).get
    assert(budget(0).data == null && budget(0).size == 300L)
    assert(new String(budget(1).data) == "z")
    assert(Ar.members(a, maxMembers = 1).isEmpty)
    assert(Ar.members(Ar.encode(Seq.empty)).exists(_.isEmpty))
  }

  test("a real .deb nesting decodes through the composed engine codecs") {
    val control = "Package: demo\nVersion: 1.0\n"
    val controlTgz = Warc.gzipMember(Tar.encodeTar(Seq("./control" -> control.getBytes)))
    val dataTxz = Codecs.xz(Tar.encodeTar(Seq(
      "./usr/bin/tool" -> "#!/bin/sh\necho hi\n".getBytes,
      "./usr/doc/readme" -> "docs".getBytes)))
    val deb = Ar.encode(Seq("debian-binary" -> "2.0\n".getBytes,
      "control.tar.gz" -> controlTgz, "data.tar.xz" -> dataTxz))
    val ms = Ar.members(deb).get
    val ctrlTar = Warc.gunzipMember(ms.find(_.name == "control.tar.gz").get.data).get
    val ctrl = Tar.listMembers(ctrlTar).get.find(_.name == "./control").get
    assert(new String(ctrlTar, ctrl.off, ctrl.size) == control)
    val dataTar = Codecs.unxz(ms.find(_.name == "data.tar.xz").get.data).get
    val files = Tar.listMembers(dataTar).get
    assert(files.map(_.name) == Seq("./usr/bin/tool", "./usr/doc/readme"))
    assert(new String(dataTar, files(1).off, files(1).size) == "docs")
  }
}
