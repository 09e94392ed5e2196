package graft

import graft.ops._
import org.scalatest.funsuite.AnyFunSuite

/** Magic-byte format router: every fixture-encoded format here is
  * detected as itself, corrupted payloads keep their detection (except
  * magic-less TFRecord) but fail health, garbage is unknown. The
  * gzip/bz2 health paths are gated by the sniff1 query; pdf/mp4/warc
  * are detect-only by design. */
class SniffSpec extends AnyFunSuite {

  private def fixtures: Seq[(String, Array[Byte])] = Seq(
    "png" -> Image.encodePng(4, 4, 0, Array.tabulate(16)(_.toByte)),
    "gif" -> Gif.encodeGif(4, 4, Array.tabulate(12)(i => (i * 21).toByte), Array.fill(16)(1.toByte)),
    "jpeg" -> Jpeg.encodeGray(8, 8, Array.fill(64)(55.toByte)),
    "wav" -> {
      val o = new java.io.ByteArrayOutputStream()
      def le(v: Long, n: Int) = (0 until n).foreach(i => o.write(((v >> (8 * i)) & 0xff).toInt))
      o.write("RIFF".getBytes); le(36 + 8, 4); o.write("WAVE".getBytes)
      o.write("fmt ".getBytes); le(16, 4); le(1, 2); le(1, 2); le(8000, 4); le(8000, 4); le(1, 2); le(8, 2)
      o.write("data".getBytes); le(8, 4); (0 until 8).foreach(o.write)
      o.toByteArray
    },
    "avi" -> Avi.encodeMjpegAvi(8, 8, 40000, Seq(Jpeg.encodeGray(8, 8, Array.fill(64)(9.toByte)))),
    "webp" -> Webp.encode("vp8", 10, 10),
    "zip" -> Zip.encodeZip(Seq(("a.txt", "hello".getBytes, true))),
    "tar" -> Tar.encodeTar(Seq(("a.txt", "hello".getBytes))),
    "tfrecord" -> TfRecord.encodeShard(Seq(TfRecord.encodeExample(1, Seq(2, 3), "x".getBytes))),
    "flac" -> AudioMeta.encodeFlac(44100, 2, 99999),
    "ogg" -> AudioMeta.encodeOgg(Seq(40, 300), 777),
    "webm" -> Ebml.encodeWebm(100.0, 1000000L, 320, 240, 48000.0, 2),
    "mp3" -> AudioMeta.encodeMp3(3, 9, 0, id3Size = 20),
    "avro" -> Avro.encode(
      Seq(Avro.Field("id", "long", nullable = false)),
      Seq(Seq(1L), Seq(2L)), "deflate", recordsPerBlock = 2, syncSeed = 4),
    "zstd" -> Codecs.zstd("zstd member text payload".getBytes),
    "lz4" -> Codecs.lz4("lz4 member text payload".getBytes),
    "snappy" -> Codecs.snappy("snappy member text payload".getBytes),
    "xz" -> Codecs.xz("xz member text payload".getBytes),
    "7z" -> SevenZip.encode(Seq("Posts.xml" -> ("<posts/>" * 8).getBytes)),
    "ar" -> Ar.encode(Seq("debian-binary" -> "2.0\n".getBytes)),
    "cpio" -> Cpio.encode(Seq("./usr/f" -> "payload".getBytes)),
    "arrow" -> ArrowIpc.encode(
      Seq(ArrowIpc.FixRec(1L, 0L, "t", 0.5, flag = true, None)), recordsPerBatch = 1))

  test("every fixture encoder detects as its own format and passes health") {
    for ((fmt, bytes) <- fixtures) {
      assert(Sniff.detect(bytes) == fmt, fmt)
      assert(Sniff.healthy(fmt, bytes), fmt)
    }
  }

  test("corrupted payloads keep detection (magic intact) but fail health") {
    for ((fmt, bytes) <- fixtures) {
      val bad = bytes.clone()
      fmt match {
        case "png" => bad(bad.length - 8) = (bad(bad.length - 8) ^ 0x11).toByte
        case "webp" => bad(23) = 0x00
        case "zip" => bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x40).toByte
        case "tar" => bad(1) = (bad(1) ^ 0x01).toByte
        case "tfrecord" => bad(14) = (bad(14) ^ 0x40).toByte
        case _ => () // truncation formats handled below
      }
      val trunc = fmt match {
        case "gif" => java.util.Arrays.copyOf(bytes, bytes.length - 4)
        case "jpeg" => java.util.Arrays.copyOf(bytes, bytes.length - 12)
        case "wav" => java.util.Arrays.copyOf(bytes, bytes.length - 3)
        case "avi" => java.util.Arrays.copyOf(bytes, bytes.length - 8)
        case "flac" | "ogg" | "webm" | "mp3" => java.util.Arrays.copyOf(bytes, bytes.length - 3)
        case "avro" => java.util.Arrays.copyOf(bytes, bytes.length - 5) // torn final sync
        case "zstd" | "lz4" | "snappy" | "xz" | "7z" | "ar" =>
          java.util.Arrays.copyOf(bytes, bytes.length - 6)
        case "cpio" => java.util.Arrays.copyOf(bytes, 115) // mid first member (trailer cuts are recoverable)
        case "arrow" =>
          // keep BOTH magics (two-ended detection) but break the footer
          val bb = bytes.clone(); bb(bytes.length - 10) = 0x7f.toByte; bb
        case _ => bad
      }
      val expectDetect = if (fmt == "tfrecord") "unknown" else fmt
      assert(Sniff.detect(trunc) == expectDetect, s"$fmt detect")
      if (fmt != "tfrecord") assert(!Sniff.healthy(fmt, trunc), s"$fmt health")
    }
  }

  test("garbage and short payloads are unknown") {
    assert(Sniff.detect(null) == "unknown")
    assert(Sniff.detect("hello world, this is text".getBytes) == "unknown")
    assert(Sniff.detect(Array[Byte](1, 2, 3)) == "unknown")
  }

  test("a 5000-record TFRecord shard detects AND health-passes (no cap mismatch)") {
    // detection is O(first record); health walks the whole shard — both
    // must accept a shard larger than any per-call default cap
    val rec = TfRecord.encodeExample(1, Seq(2L), "z".getBytes)
    val shard = TfRecord.encodeShard(Seq.fill(5000)(rec))
    assert(Sniff.detect(shard) == "tfrecord")
    assert(Sniff.healthy("tfrecord", shard))
  }

  test("a torn trailing TFRecord record keeps detection but fails health") {
    val rec = TfRecord.encodeExample(1, Seq(2L), "z".getBytes)
    val shard = TfRecord.encodeShard(Seq.fill(4)(rec))
    val torn = java.util.Arrays.copyOf(shard, shard.length - 3)
    assert(Sniff.detect(torn) == "tfrecord") // first record is intact
    assert(!Sniff.healthy("tfrecord", torn))
  }
}
