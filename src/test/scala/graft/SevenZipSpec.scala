package graft

import graft.ops.SevenZip
import org.scalatest.funsuite.AnyFunSuite

/** 7z archive walk: round trip, header-CRC quarantine (torn and
  * flipped archives), the member/total bomb budgets, and empty
  * archives. */
class SevenZipSpec extends AnyFunSuite {

  private val members = Seq(
    "Posts.xml" -> ("<posts><row Id=\"1\" Body=\"hello\"/></posts>" * 20).getBytes("UTF-8"),
    "Users.xml" -> ("<users><row Id=\"2\"/></users>" * 10).getBytes("UTF-8"),
    "dir/readme.txt" -> "nested member".getBytes("UTF-8"))

  test("round trip: names, sizes, and content survive LZMA2") {
    val a = SevenZip.encode(members)
    val ms = SevenZip.members(a).get
    assert(ms.map(_.name) == members.map(_._1))
    ms.zip(members).foreach { case (got, (_, want)) =>
      assert(got.size == want.length)
      assert(java.util.Arrays.equals(got.data, want))
    }
  }

  test("torn and flipped archives quarantine; garbage and null fail closed") {
    val a = SevenZip.encode(members)
    for (cut <- Seq(a.length - 4, a.length / 2, 20))
      assert(SevenZip.members(java.util.Arrays.copyOf(a, cut)).isEmpty, s"cut $cut")
    val flip = a.clone()
    // offset 34 is inside the packed LZMA2 stream (the signature header
    // occupies the first 32 bytes) — a mid-file flip can land in slack
    flip(34) = (flip(34) ^ 0x20).toByte
    // 7z headers carry CRCs: a mid-archive flip must quarantine (either
    // header parse or member extraction), never return wrong bytes
    SevenZip.members(flip) match {
      case None => ()
      case Some(ms) =>
        assert(!ms.zip(members).forall { case (g, (_, w)) =>
          g.data != null && java.util.Arrays.equals(g.data, w) },
          "flip silently returned the original archive")
    }
    assert(SevenZip.members(null).isEmpty)
    assert(SevenZip.members("not a seven zip archive at all".getBytes).isEmpty)
    // a header declaring a huge LZMA2 dictionary must quarantine via the
    // decoder memory limit, never OutOfMemoryError the task (512 MiB
    // declared dictionary, far past the 256 MiB decode cap)
    val bigDict = SevenZip.encode(Seq("a.txt" -> "x".getBytes), preset = 9,
      dictSize = 1 << 29)
    assert(SevenZip.members(bigDict).isEmpty, "past-cap dictionary must quarantine")

  }

  test("budgets: oversized members keep metadata with null payload; caps fail closed") {
    val big = SevenZip.encode(Seq("big.bin" -> new Array[Byte](100000),
      "small.txt" -> "ok".getBytes))
    val ms = SevenZip.members(big, maxMemberBytes = 1024).get
    assert(ms.map(_.name) == Seq("big.bin", "small.txt"))
    assert(ms(0).data == null && ms(0).size == 100000L)
    assert(new String(ms(1).data) == "ok")
    assert(SevenZip.members(big, maxMembers = 1).isEmpty)
    // valid empty archive → Some(empty)
    assert(SevenZip.members(SevenZip.encode(Seq.empty)).exists(_.isEmpty))
  }
}
