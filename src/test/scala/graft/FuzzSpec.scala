package graft

import org.scalatest.funsuite.AnyFunSuite

/** The hostile-corpus contract, enforced mechanically: every decoder in
  * the engine must return (None / empty / a quarantined value) — never
  * throw, never hang, never emit garbage sizes — under thousands of
  * deterministic byte mutations of a valid payload. Three mutation
  * classes per format: single bit flips across the whole payload,
  * truncations at every prefix length, and random block overwrites.
  * A decoder that survives this plus its format spec's positive cases
  * satisfies the fail-closed contract the 100 TB crawl path assumes
  * (one hostile file quarantines a row, not a task). */
class FuzzSpec extends AnyFunSuite {

  import graft.ops._

  private def fixtures: Seq[(String, Array[Byte], Array[Byte] => Any)] = {
    val gray = Array.tabulate(16 * 16)(i => ((i * 7) % 251).toByte)
    Seq(
      ("png", Image.encodePng(6, 5, 0, Array.tabulate(30)(_.toByte)),
        b => Image.decodePng(b)),
      ("gif", Gif.encodeGif(6, 5, Array.tabulate(12)(i => (i * 19).toByte), Array.fill(30)(2.toByte)),
        b => Gif.decodeGif(b)),
      ("jpeg", Jpeg.encodeGray(16, 16, gray), b => Jpeg.decode(b)),
      ("jpeg-prog", Jpeg.encodeGrayProgressive(16, 16, gray), b => Jpeg.decode(b)),
      ("avi", Avi.encodeMjpegAvi(16, 16, 40000, Seq(Jpeg.encodeGray(16, 16, gray))),
        b => Avi.decodeMjpeg(b)),
      ("webp", Webp.encode("vp8l", 20, 10), b => Webp.dims(b)),
      ("tar", Tar.encodeTar(Seq("a.jpg" -> gray, "a.txt" -> "caption".getBytes)),
        b => Tar.listMembers(b)),
      ("zip", Zip.encodeZip(Seq(("w/d.xml", "<w:document/>".getBytes, true))),
        b => Zip.listEntries(b).foreach(es => es.foreach(e => Zip.extract(b, e)))),
      ("tfrecord", TfRecord.encodeShard(Seq(TfRecord.encodeExample(1, Seq(2, 3), "t".getBytes))),
        b => TfRecord.readRecords(b).foreach(_.foreach { case (o, l) => TfRecord.parseExample(b, o, l) })),
      ("bz2", Bzip2.encode(("fuzz me gently, fuzz me thoroughly " * 10).getBytes),
        b => Bzip2.decode(b)),
      ("mp3", AudioMeta.encodeMp3(4, 9, 0, id3Size = 11), b => AudioMeta.decode(b)),
      ("flac", AudioMeta.encodeFlac(44100, 2, 12345), b => AudioMeta.decode(b)),
      ("ogg", AudioMeta.encodeOgg(Seq(40, 300), 777), b => AudioMeta.decode(b)),
      ("webm", Ebml.encodeWebm(100.0, 1000000L, 64, 48, 48000.0, 2), b => Ebml.decode(b)),
      ("avro", Avro.encode(
        Seq(Avro.Field("id", "long", nullable = false),
          Avro.Field("text", "string", nullable = false),
          Avro.Field("payload", "bytes", nullable = true)),
        (0 until 6).map(k => Seq[Any](k.toLong, "t" * (k + 1),
          if (k % 2 == 0) null else Array[Byte](1, 2))),
        "deflate", recordsPerBlock = 2, syncSeed = 7),
        b => Avro.decode(b)),
      ("arrow", ArrowIpc.encode(
        (0 until 5).map(k => ArrowIpc.FixRec(k.toLong, k % 3, "t" * (k + 1), k / 4.0,
          k % 2 == 0, if (k % 2 == 0) None else Some(Array[Byte](1, 2)))),
        recordsPerBatch = 2),
        b => ArrowIpc.decode(b)),
      ("zstd", Codecs.zstd(("fuzz me gently " * 12).getBytes), b => Codecs.unzstd(b)),
      ("lz4", Codecs.lz4(("fuzz me gently " * 12).getBytes), b => Codecs.unlz4(b)),
      ("snappy", Codecs.snappy(("fuzz me gently " * 12).getBytes), b => Codecs.unsnappy(b)),
      ("xz", Codecs.xz(("fuzz me gently " * 12).getBytes), b => Codecs.unxz(b)),
      ("7z", SevenZip.encode(Seq("a.xml" -> ("<row/>" * 20).getBytes, "b.txt" -> "text".getBytes)),
        b => SevenZip.members(b)),
      ("ar", Ar.encode(Seq("debian-binary" -> "2.0\n".getBytes, "ctl" -> ("c" * 50).getBytes)),
        b => Ar.members(b)),
      ("cpio", Cpio.encode(Seq("./usr/f" -> ("q" * 60).getBytes, "./etc/c" -> "kv".getBytes)),
        b => Cpio.members(b)),
      ("wav-g711", {
        val o = new java.io.ByteArrayOutputStream()
        def le(v: Long, n: Int) = (0 until n).foreach(i => o.write(((v >> (8 * i)) & 0xff).toInt))
        o.write("RIFF".getBytes); le(36 + 16, 4); o.write("WAVE".getBytes)
        o.write("fmt ".getBytes); le(16, 4); le(7, 2); le(1, 2); le(8000, 4); le(8000, 4); le(1, 2); le(8, 2)
        o.write("data".getBytes); le(16, 4); (0 until 16).foreach(o.write)
        o.toByteArray
      }, b => Audio.decodeWavPcm(b)))
  }

  test("single bit flips never throw or hang any decoder") {
    for ((name, base, decode) <- fixtures) {
      var i = 0
      while (i < base.length) {
        var bit = 0
        while (bit < 8) {
          val m = base.clone()
          m(i) = (m(i) ^ (1 << bit)).toByte
          try decode(m)
          catch { case e: Throwable => fail(s"$name: flip byte $i bit $bit threw $e") }
          bit += (if (base.length > 600) 7 else 1) // long payloads: sample bits
        }
        i += (if (base.length > 600) 3 else 1)
      }
    }
  }

  test("every truncation prefix is quarantined, not thrown") {
    for ((name, base, decode) <- fixtures; cut <- 0 until base.length) {
      try decode(java.util.Arrays.copyOf(base, cut))
      catch { case e: Throwable => fail(s"$name: truncation at $cut threw $e") }
    }
  }

  test("random 8-byte block overwrites never throw") {
    val rng = new scala.util.Random(4242)
    for ((name, base, decode) <- fixtures; _ <- 0 until 200) {
      val m = base.clone()
      val at = rng.nextInt(math.max(1, m.length - 8))
      (0 until math.min(8, m.length - at)).foreach(k => m(at + k) = rng.nextInt(256).toByte)
      try decode(m)
      catch { case e: Throwable => fail(s"$name: overwrite at $at threw $e") }
    }
  }
}
