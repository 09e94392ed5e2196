package graft.ops

/** Modern compressed-member decode — zstd (RFC 8878), LZ4 frame, and
  * snappy framed format, the codecs data-lake exports and web-scale
  * dataset mirrors actually ship beyond gzip/bz2 (`.jsonl.zst` corpora,
  * `.lz4`/`.snappy` warehouse part-files). Decoding rides Spark's OWN
  * codec libraries — the same zstd-jni / lz4-java / snappy-java jars
  * every executor already trusts for shuffle blocks and parquet pages —
  * wrapped in the engine's hostile-corpus contract:
  *
  *  - bounded output (`maxOut`): a small payload claiming to expand to
  *    gigabytes is a decompression bomb, not a document — quarantined,
  *    not materialized;
  *  - every codec exception (bad magic, torn frame, checksum mismatch)
  *    → None, one hostile payload quarantines one row, never a task;
  *  - a decode that consumes the stream but leaves trailing garbage is
  *    accepted only for the zero-length tail real writers emit.
  *
  * Corruption detectability varies by format and is pinned in
  * CodecsSpec: zstd frames end with an optional checksum but torn
  * frames throw; LZ4 frames carry a content checksum (the encoder here
  * enables it) so both truncation AND bit flips fail; snappy framed
  * chunks carry per-chunk masked CRC32-C so flips fail and torn chunks
  * throw. Encoders (fixture side) live next to the decoders like every
  * codec pair in the engine. */
object Codecs {

  private def drain(mk: => java.io.InputStream, maxOut: Int): Option[Array[Byte]] = {
    var in: java.io.InputStream = null
    try {
      in = mk
      val out = new java.io.ByteArrayOutputStream(8192)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) {
          out.write(buf, 0, n)
          if (out.size > maxOut) return None // bomb bound
        }
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (in != null) { try in.close() catch { case scala.util.control.NonFatal(_) => () } }
  }

  /** Zstandard frame decode (magic 28 B5 2F FD). */
  def unzstd(b: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 4) return None
    drain(new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(b)), maxOut)
  }

  /** LZ4 frame decode (magic 04 22 4D 18). */
  def unlz4(b: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 7) return None
    drain(new net.jpountz.lz4.LZ4FrameInputStream(
      new java.io.ByteArrayInputStream(b)), maxOut)
  }

  /** Snappy framed-format decode (magic FF 06 00 00 "sNaPpY"); chunk
    * CRCs verified by the stream. */
  def unsnappy(b: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 10) return None
    drain(new org.xerial.snappy.SnappyFramedInputStream(
      new java.io.ByteArrayInputStream(b), true), maxOut)
  }

  /** XZ decode (magic FD 37 7A 58 5A 00) via the XZ-for-Java library on
    * the Spark classpath; the format's own CRC32/CRC64/SHA-256 block
    * checks make bit flips detectable, and the memory-limit constructor
    * bounds the decoder's dictionary allocation independent of
    * `maxOut`. */
  def unxz(b: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 12) return None
    drain(new org.tukaani.xz.XZInputStream(
      new java.io.ByteArrayInputStream(b), 1 << 16 /* KiB memory limit = 64 MiB */), maxOut)
  }

  // ------------------------------------------------------------------
  // Fixture encoders.

  def zstd(data: Array[Byte], level: Int = 3): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val z = new com.github.luben.zstd.ZstdOutputStream(bo, level)
    z.write(data); z.close()
    bo.toByteArray
  }

  def lz4(data: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(data.length + 64)
    // content-checksum flag on: makes bit flips detectable, not just truncation
    val l = new net.jpountz.lz4.LZ4FrameOutputStream(bo,
      net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB, data.length.toLong,
      net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE,
      net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.CONTENT_CHECKSUM,
      net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.CONTENT_SIZE)
    l.write(data); l.close()
    bo.toByteArray
  }

  def snappy(data: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(data.length + 64)
    val s = new org.xerial.snappy.SnappyFramedOutputStream(bo)
    s.write(data); s.close()
    bo.toByteArray
  }

  /** `dictSize` > 0 overrides the preset's dictionary (the 7z
    * fixture-economics lesson: encoder init is dictionary-dominated —
    * thousands of tiny fixture payloads want 4 KiB, one real corpus
    * member wants the preset default). */
  def xz(data: Array[Byte], preset: Int = 3, dictSize: Int = 0): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val opts = new org.tukaani.xz.LZMA2Options(preset)
    if (dictSize > 0) opts.setDictSize(dictSize)
    val x = new org.tukaani.xz.XZOutputStream(bo, opts)
    x.write(data); x.close()
    bo.toByteArray
  }
}
