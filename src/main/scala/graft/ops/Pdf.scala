package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{BinaryType, StringType, StructField}

/** REAL PDF text-layer extraction — no external codec. The container has
  * no PDF library, but the PDF text layer needs none: content streams are
  * either raw or FlateDecode-compressed (the overwhelmingly common case),
  * and `java.util.zip.Inflater` ships with the JDK. This upgrades the S1
  * "PDF scan" surface (ref `ingestion/pdf_parser.py:391-485`) from a
  * modeled binary column to an actual parse for text-bearing PDFs:
  *
  *  - `extractText`: scan `stream…endstream` objects, inflate those whose
  *    object dictionary declares `/FlateDecode`, then read the show-text
  *    operators (`(…) Tj`, `[(…)…(…)] TJ`, `(…) '`) from the decoded
  *    content with PDF string-escape handling (\\, \( \) \n \r \t \b \f,
  *    octal \ddd). Extracted strings concatenate in stream order.
  *  - `extractStage`: the distributed seam — a bounded-batch mapPartitions
  *    over a binary payload column, the same executor-side shape as
  *    [[Multimodal.extractFeatures]] (and the drop-in place a full layout
  *    parser with bbox fidelity would slot into).
  *
  * Honest limits (documented, spec-pinned): balanced UNESCAPED parens
  * inside string literals are not parsed (writers escape them); hex
  * strings `<…> Tj`, per-glyph encodings/CMaps, and non-Flate filters
  * (DCT, LZW) are out of scope — such streams simply contribute nothing.
  * Malformed/undecodable streams are skipped, never thrown: at corpus
  * scale a crawl WILL contain broken PDFs and one bad file must not kill
  * a 100 TB ingest stage.
  */
object Pdf {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Minimal single-page PDF wrapping `text` as one `Tj` (or a split
    * `TJ` when `splitShow`) — the test/fixture builder. Kept deliberately
    * byte-layout-literal and SEPARATE from the parser so the gate query
    * proves the parser inverts a structurally honest document, not a
    * shared implementation. */
  def buildMinimalPdf(text: String, compress: Boolean, splitShow: Boolean = false): Array[Byte] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val show =
      if (splitShow) {
        val mid = text.length / 2
        s"[(${esc(text.take(mid))}) -250 (${esc(text.drop(mid))})] TJ"
      } else s"(${esc(text)}) Tj"
    val content = s"BT /F1 12 Tf 72 700 Td $show ET".getBytes(Ascii)
    val (body, filter) =
      if (compress) {
        val d = new java.util.zip.Deflater()
        d.setInput(content); d.finish()
        val buf = new Array[Byte](content.length * 2 + 64)
        val n = d.deflate(buf); d.end()
        (java.util.Arrays.copyOf(buf, n), " /Filter /FlateDecode")
      } else (content, "")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Ascii))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length}$filter >> stream\n")
    out.write(body)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /** All decoded content-stream bytes of a PDF, concatenated with \n. */
  private def contentStreams(bytes: Array[Byte]): String = {
    val raw = new String(bytes, Ascii)
    val sb = new StringBuilder
    var from = 0
    var kw = raw.indexOf("stream", from)
    while (kw >= 0) {
      // "endstream" contains "stream" — only a real stream keyword is
      // followed by an end-of-line per the spec
      val afterKw = kw + "stream".length
      val dataStart =
        if (raw.startsWith("\r\n", afterKw)) afterKw + 2
        else if (raw.startsWith("\n", afterKw) || raw.startsWith("\r", afterKw)) afterKw + 1
        else -1
      if (dataStart >= 0) {
        val end = raw.indexOf("endstream", dataStart)
        if (end >= 0) {
          var dataEnd = end
          if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val dict = raw.substring(math.max(0, kw - 512), kw)
          val dictTail = dict.lastIndexOf("<<") match {
            case -1 => dict
            case i => dict.substring(i)
          }
          val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val decoded: Option[Array[Byte]] =
            if (dictTail.contains("/FlateDecode")) inflate(data) else Some(data)
          decoded.foreach { d =>
            if (sb.nonEmpty) sb.append('\n')
            sb.append(new String(d, Ascii))
          }
          from = end + "endstream".length
        } else from = afterKw
      } else from = afterKw
      kw = raw.indexOf("stream", from)
    }
    sb.toString
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    // end() in finally: Inflater holds NATIVE zlib memory that only a GC
    // finalizer would otherwise reclaim — on an executor chewing through
    // millions of PDFs (many corrupt, per the crawl contract above) the
    // leak is invisible to the heap but OOM-kills the container
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stuck: corrupt
      }
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  // a PDF string literal: escaped chars or anything but backslash/parens
  private val StringLit = """\(((?:\\.|[^\\()])*)\)"""
  private val ShowOp = (StringLit + """\s*(?:Tj|')""").r
  private val ShowArr = ("""\[((?:""" + StringLit + """|[^\[\]])*)\]\s*TJ""").r
  private val InnerLit = StringLit.r
  private val Octal = """\\([0-7]{1,3})""".r

  private def unescape(s: String): String = {
    val noOctal = Octal.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 8).toChar.toString))
    val sb = new StringBuilder
    var i = 0
    while (i < noOctal.length) {
      val c = noOctal.charAt(i)
      if (c == '\\' && i + 1 < noOctal.length) {
        noOctal.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t'); case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case other => sb.append(other) // \( \) \\ and unknown escapes
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The text layer of one PDF payload: all show-text operator strings in
    * stream order, concatenated. Never throws — a broken payload yields
    * "". */
  def extractText(bytes: Array[Byte]): String =
    try {
      val content = contentStreams(bytes)
      val pieces = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      for (m <- ShowOp.findAllMatchIn(content)) pieces += ((m.start, unescape(m.group(1))))
      for (m <- ShowArr.findAllMatchIn(content)) {
        val inner = InnerLit.findAllMatchIn(m.group(1)).map(x => unescape(x.group(1))).mkString
        pieces += ((m.start, inner))
      }
      pieces.sortBy(_._1).map(_._2).mkString
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Distributed extraction stage: binary `payloadCol` → string `outCol`,
    * one row streamed at a time ([[Stages.appendFields]]). */
  def extractStage(df: DataFrame, payloadCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    Stages.appendFields(df, Seq(StructField(outCol, StringType)))(
      r => Seq(extractText(r.getAs[Array[Byte]](idx))))
  }

  /** Fixture-builder stage for the gate query: wrap a text column into a
    * real single-page PDF payload (compressed / uncompressed / TJ-split
    * by flags) — runs executor-side because Deflate is not a SQL
    * expression. */
  def buildStage(df: DataFrame, textCol: String, compressCol: String, splitCol: String,
                 outCol: String): DataFrame = {
    val tIdx = df.schema.fieldIndex(textCol)
    val cIdx = df.schema.fieldIndex(compressCol)
    val sIdx = df.schema.fieldIndex(splitCol)
    Stages.appendFields(df, Seq(StructField(outCol, BinaryType)))(
      r => Seq(buildMinimalPdf(r.getString(tIdx), r.getBoolean(cIdx), r.getBoolean(sIdx))))
  }
}
