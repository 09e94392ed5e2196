package graft

import graft.ops.TfRecord
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing (masked CRC32C) + tf.Example protobuf parse:
  * published check vectors, round trips, both quarantine levels, and
  * proto unknown-field skipping. */
class TfRecordSpec extends AnyFunSuite {

  test("CRC-32C anchor: the published check value for '123456789'") {
    val c = new java.util.zip.CRC32C()
    c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue == 0xE3069283L) // Castagnoli check value (public test vector)
  }

  test("round trip: examples frame, verify, and parse exactly") {
    val recs = (0 until 3).map(j =>
      TfRecord.encodeExample(j + 5, Seq(10L + j, 20L + j, 30L), s"text-$j".getBytes("UTF-8")))
    val shard = TfRecord.encodeShard(recs)
    val spans = TfRecord.readRecords(shard).get
    assert(spans.length == 3)
    for (((o, l), j) <- spans.zipWithIndex) {
      val fm = TfRecord.parseExample(shard, o, l).get
      assert(fm("label").int64s == Seq(j + 5L))
      assert(fm("tokens").int64s == Seq(10L + j, 20L + j, 30L))
      assert(new String(fm("text").bytess.head, "UTF-8") == s"text-$j")
    }
  }

  test("shard-level quarantine: any CRC mismatch or truncation fails whole") {
    val shard = TfRecord.encodeShard(Seq(TfRecord.encodeExample(1, Seq(2), "x".getBytes)))
    assert(TfRecord.readRecords(shard).nonEmpty)
    val badData = shard.clone(); badData(14) = (badData(14) ^ 0x40).toByte
    assert(TfRecord.readRecords(badData).isEmpty)
    val badLenCrc = shard.clone(); badLenCrc(9) = (badLenCrc(9) ^ 0x01).toByte
    assert(TfRecord.readRecords(badLenCrc).isEmpty)
    assert(TfRecord.readRecords(java.util.Arrays.copyOf(shard, shard.length - 2)).isEmpty)
    assert(TfRecord.readRecords(null).isEmpty)
    assert(TfRecord.readRecords(Array.emptyByteArray).get.isEmpty)
  }

  test("record-level quarantine: CRC-sound frames with broken protobuf parse to None") {
    val garbage = Array[Byte](0x0A, 0xFF.toByte) // field 1 len-delim, length overrun
    val shard = TfRecord.encodeShard(Seq(TfRecord.encodeExample(1, Seq(2), "x".getBytes), garbage))
    val spans = TfRecord.readRecords(shard).get
    assert(spans.length == 2)
    assert(TfRecord.parseExample(shard, spans(0)._1, spans(0)._2).nonEmpty)
    assert(TfRecord.parseExample(shard, spans(1)._1, spans(1)._2).isEmpty)
  }

  test("unknown proto fields are skipped; packed int64 lists parse too") {
    val base = TfRecord.encodeExample(7, Seq(1, 2, 3), "y".getBytes)
    // append an unknown varint field (9) and an unknown len-delim field (10)
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(base)
    extra.write((9 << 3) | 0); extra.write(0x2a)
    extra.write((10 << 3) | 2); extra.write(2); extra.write(1); extra.write(1)
    val fm = TfRecord.parseExample(extra.toByteArray, 0, extra.size).get
    assert(fm("label").int64s == Seq(7L) && fm("tokens").int64s == Seq(1L, 2L, 3L))
    // packed encoding of Int64List.value: field 1 wire 2 with raw varints
    val packed = new java.io.ByteArrayOutputStream()
    // Example{ Features{ entry{ key:"p", Feature{ Int64List{ packed [4,5] }}}}}
    def ld(out: java.io.ByteArrayOutputStream, field: Int, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write((field << 3) | 2); o.write(body.length); o.write(body); o.toByteArray
    }
    val packedVals = Array[Byte](((1 << 3) | 2).toByte, 2, 4, 5)
    val i64list = ld(packed, 3, packedVals)
    val feat = ld(packed, 2, i64list)
    val key = ld(packed, 1, "p".getBytes)
    val entry = ld(packed, 1, key ++ feat)
    val features = ld(packed, 1, entry)
    val fm2 = TfRecord.parseExample(features, 0, features.length).get
    assert(fm2("p").int64s == Seq(4L, 5L))
  }

  test("firstRecordValid: O(first record) probe matches full-walk semantics at the head") {
    val rec = TfRecord.encodeExample(1, Seq(2L), "x".getBytes)
    val shard = TfRecord.encodeShard(Seq(rec, rec, rec))
    assert(TfRecord.firstRecordValid(shard))
    // torn tail: first record intact → probe true, full walk None
    val torn = java.util.Arrays.copyOf(shard, shard.length - 2)
    assert(TfRecord.firstRecordValid(torn))
    assert(TfRecord.readRecords(torn).isEmpty)
    // corrupt first data byte → probe false
    val bad = shard.clone(); bad(13) = (bad(13) ^ 0x01).toByte
    assert(!TfRecord.firstRecordValid(bad))
    // corrupt length CRC → probe false
    val badLen = shard.clone(); badLen(9) = (badLen(9) ^ 0x01).toByte
    assert(!TfRecord.firstRecordValid(badLen))
    assert(!TfRecord.firstRecordValid(null))
    assert(!TfRecord.firstRecordValid(Array.emptyByteArray))
    assert(!TfRecord.firstRecordValid(Array.fill(40)(7.toByte)))
  }
}
