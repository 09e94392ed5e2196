package graft

import graft.ops.ArrowIpc
import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC file walk: round trips through the reference writer,
  * batch-boundary preservation, structural quarantine (both magics,
  * torn tails, garbage), the allocator bomb bound, and the documented
  * no-checksum caveat. */
class ArrowIpcSpec extends AnyFunSuite {

  private def mk(n: Int): Seq[ArrowIpc.FixRec] =
    (0 until n).map(k => ArrowIpc.FixRec(100L + k, k % 5, "t" * (k % 7),
      (k % 16) / 8.0, k % 2 == 0,
      if (k % 3 == 0) None else Some(Array.tabulate(k % 4 + 1)(_.toByte))))

  test("round trip: values, nulls, and batch boundaries survive") {
    val bytes = ArrowIpc.encode(mk(10), recordsPerBatch = 4)
    val f = ArrowIpc.decode(bytes).get
    assert(f.names == Seq("id", "label", "text", "score", "flag", "payload"))
    assert(f.batches.map(_.records.length) == Seq(4, 4, 2))
    val recs = f.batches.flatMap(_.records)
    assert(recs.length == 10)
    recs.zip(mk(10)).foreach { case (got, want) =>
      assert(got(0) == want.id && got(1) == want.label)
      assert(got(2) == want.text && got(3) == want.score && got(4) == want.flag)
      (got(5), want.payload) match {
        case (null, None) => ()
        case (a: Array[Byte], Some(b)) => assert(java.util.Arrays.equals(a, b))
        case other => fail(other.toString)
      }
    }
  }

  test("structural quarantine: torn tails, flipped magic, garbage, empty file") {
    val bytes = ArrowIpc.encode(mk(8), recordsPerBatch = 3)
    for (cut <- Seq(bytes.length - 3, bytes.length / 2, 11))
      assert(ArrowIpc.decode(java.util.Arrays.copyOf(bytes, cut)).isEmpty, s"cut $cut")
    val badHead = bytes.clone(); badHead(0) = 'X'.toByte
    assert(ArrowIpc.decode(badHead).isEmpty)
    val badFooter = bytes.clone()
    // corrupt the footer length field just before the tail magic
    badFooter(bytes.length - 10) = 0x7f.toByte
    assert(ArrowIpc.decode(badFooter).isEmpty)
    assert(ArrowIpc.decode(null).isEmpty)
    assert(ArrowIpc.decode("definitely not arrow".getBytes).isEmpty)
    // a valid file with zero batches decodes to Some with no batches
    val empty = ArrowIpc.encode(Seq.empty, recordsPerBatch = 4)
    assert(ArrowIpc.decode(empty).exists(_.batches.isEmpty))
  }

  test("the allocator bound quarantines instead of materializing a bomb") {
    val big = ArrowIpc.encode(mk(4).map(_.copy(text = "x" * 100000)), recordsPerBatch = 4)
    assert(ArrowIpc.decode(big).nonEmpty)
    assert(ArrowIpc.decode(big, maxAlloc = 1L << 10).isEmpty, "tight allocator must fail closed")
    assert(ArrowIpc.decode(big, maxRecords = 2).isEmpty, "record cap must fail closed")
  }
}
