package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType, StructField}

/** WARC (ISO 28500) record handling — the wire format a web-crawl corpus
  * (Common Crawl and every in-house crawler) actually arrives in: CRLF
  * header block (`WARC/1.0`, `WARC-Type`, `WARC-Record-ID`,
  * `WARC-Target-URI`, `Content-Length`), blank line, payload.
  *
  * All pure codegen'd string expressions (regexp + substring — no UDF),
  * so a 100 TB crawl parse is an embarrassingly-parallel map over the
  * record column; the Content-Length integrity check is how a pipeline
  * quarantines truncated fetches before they poison dedup/extraction
  * stages downstream.
  */
object Warc {

  private val Crlf2 = "\r\n\r\n"

  /** Extract one named header's value from a record (case-sensitive field
    * names per the spec's canonical forms). Anchored to a line start so a
    * payload echoing "Content-Length:" cannot spoof it — headers are only
    * searched before the first blank line. The value class `[^\r\n]*`
    * (rather than a lazy `.*?$`) sidesteps the Java-vs-RE2 difference in
    * how multiline `$` treats a CRLF pair. `name` must be a plain header
    * token (RE2 has no \Q quoting to hide metacharacters behind). */
  def header(rec: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9-]+"), s"not a plain WARC header token: $name")
    val headers = substring_index(rec, Crlf2, 1)
    regexp_extract(headers, "(?m)^" + name + ": ([^\\r\\n]*)", 1)
  }

  /** The payload: everything after the first blank line (DOTALL — the
    * payload may itself contain CRLFs). */
  def payload(rec: Column): Column =
    regexp_extract(rec, "(?s)\\r\\n\\r\\n(.*)$", 1)

  /** Parsed record as typed columns + the Content-Length integrity flag:
    * (warc_type, record_id, target_uri, declared_len, actual_len,
    * len_ok). Content-Length declares OCTETS (ISO 28500 §5.3), so
    * actual_len measures UTF-8 bytes via a binary cast, not characters —
    * a multibyte payload would otherwise be flagged as truncated. */
  def parse(rec: Column): Column = {
    val p = payload(rec)
    val declared = header(rec, "Content-Length").cast("long")
    val octets = length(p.cast("binary")).cast("long")
    struct(
      header(rec, "WARC-Type").as("warc_type"),
      header(rec, "WARC-Record-ID").as("record_id"),
      header(rec, "WARC-Target-URI").as("target_uri"),
      declared.as("declared_len"),
      octets.as("actual_len"),
      (declared === octets).as("len_ok"))
  }

  // ---------------------------------------------------------------------
  // Gzip members (round 6): real Common Crawl WARC files are stored
  // member-gzip — each record is its own complete gzip member, so a
  // reader can split on member boundaries and decompress records
  // independently (ISO 28500 Annex D record-at-time compression). That
  // independence is exactly what makes the format distributable: one row
  // = one member = one `GZIPInputStream` round trip, embarrassingly
  // parallel, no cross-record state. The JDK ships the codec
  // (`java.util.zip.GZIPOutputStream`/`GZIPInputStream`), so unlike the
  // image-pixel seam this path is REAL end-to-end.

  /** One record → one gzip member. Deterministic for a given JVM (header
    * MTIME is 0, OS byte fixed) — and the catalog never hashes the
    * compressed bytes anyway, only the decompressed round trip. */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.finish(); gz.close()
    out.toByteArray
  }

  /** Decompress one member, bounded and fail-to-None: a truncated fetch
    * (cut trailer / mid-stream EOF), garbage bytes, or a decompressed
    * size past `maxBytes` (zip-bomb guard — a 100 TB crawl ingest cannot
    * let one hostile member balloon an executor) all yield None, never an
    * exception. The Inflater's native memory is released via close() in
    * finally (the [[graft.ops.Pdf]] inflate lesson). */
  def gunzipMember(bytes: Array[Byte], maxBytes: Int = 1 << 24): Option[Array[Byte]] = {
    // the constructor itself reads (and may reject) the member header —
    // it must sit inside the try with the read loop
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4 + 64, maxBytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size.toLong + n > maxBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
    finally if (in != null) in.close()
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Compress a string record column into a binary gzip-member column —
    * the fixture-builder half (Deflate is not a SQL expression; runs
    * executor-side through the shared [[Stages.appendFields]] seam). */
  def gzipStage(df: DataFrame, recCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(recCol)
    Stages.appendFields(df, Seq(StructField(outCol, BinaryType)))(
      r => Seq(gzipMember(r.getString(idx).getBytes(Utf8))))
  }

  /** Decompress a binary member column back to a string record column;
    * corrupt/truncated members yield NULL (every downstream [[parse]]
    * column then nulls out — the quarantine row survives, the task
    * doesn't die). */
  def gunzipStage(df: DataFrame, memberCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(memberCol)
    Stages.appendFields(df, Seq(StructField(outCol, StringType)))(
      r => Seq(gunzipMember(r.getAs[Array[Byte]](idx)).map(new String(_, Utf8)).orNull))
  }
}
