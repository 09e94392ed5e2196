package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
