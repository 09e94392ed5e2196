package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/row cleaning operators (SURVEY.md §2.2 P1–P11).
  *
  * All deterministic-path operators are pure Catalyst column expressions
  * (codegen'd, no UDFs), mirroring the reference's cleaner semantics:
  *  - P1 normalize: ref `ingestion/cleaner.py:36-59`
  *  - P2 noise filter: ref `ingestion/cleaner.py:62-84`
  *  - P3 Thai de-hyphenation: ref `ingestion/table_extractor.py:72-83`
  *  - P4 header/footer cut: ref `ingestion/pdf_parser.py:152-171,332`
  *  - P9 doc_id sanitize: ref `backend/main.py:48-68`
  *  - P10 HTML sanitize: ref `backend/services/rag.py:122-127`
  */
object Cleaning {

  /** Unicode NFC canonical composition (native `functions.
    * NfcNormalizeExpr`) — run before any hash-based dedup so 'é' and
    * 'e'+COMBINING ACUTE produce one digest. Pure-ASCII rows (the
    * overwhelmingly common case) return the original buffer with no
    * allocation; non-ASCII rows pay one isNormalized scan and only
    * actually-decomposed text pays the normalize. */
  def nfcNormalize(c: Column): Column = {
    graft.functions.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
  }

  /** P1: strip control/zero-width/NBSP chars, collapse inline whitespace,
    * trim space around newlines, cap blank lines at 2. */
  def normalizeText(c: Column): Column = {
    val noCtl = regexp_replace(c, "[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u200B\\u200C\\u200D\\uFEFF]", "")
    val nbsp = regexp_replace(noCtl, "\\u00A0", " ")
    val collapsed = regexp_replace(nbsp, "[ \\t]+", " ")
    val trimNl = regexp_replace(regexp_replace(collapsed, " *\\n *", "\n"), "\\n{3,}", "\n\n")
    trim(trimNl)
  }

  /** P2: true when a block is noise — bare page number, ≤1 word char, or
    * punctuation-only. Word chars include Thai range as in the ref. */
  def isNoise(c: Column): Column = {
    val bare = trim(c)
    val pageNum = bare.rlike("^-?\\s*\\d+\\s*-?$")
    val wordChars = length(regexp_replace(bare, "[^A-Za-z0-9\\u0E00-\\u0E7F]", ""))
    pageNum || (wordChars <= 1)
  }

  /** P3: remove line breaks between Thai characters, collapse whitespace,
    * strip `...` dot leaders. Java regex lookaround handles the Thai range. */
  def dehyphenateThai(c: Column): Column = {
    val joined = regexp_replace(c, "(?<=[\\u0E00-\\u0E7F])\\s*[\\r\\n]+\\s*(?=[\\u0E00-\\u0E7F])", "")
    val noLeader = regexp_replace(joined, "\\.{3,}", " ")
    trim(regexp_replace(noLeader, "\\s+", " "))
  }

  /** P4: keep only blocks inside the content band of the page
    * (drop headers above 7% and footers below 93% of page height). */
  def inContentBand(y0: Column, y1: Column, pageHeight: Column): Column =
    (y1 >= pageHeight * 0.07) && (y0 <= pageHeight * 0.93)

  /** P9: doc_id sanitize — lowercase, whitespace→`_`, keep `[a-z0-9_-]` plus
    * the Thai block. */
  def sanitizeDocId(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "\\s+", "_"), "[^a-z0-9_\\-\\u0E00-\\u0E7F]", "")

  /** P10: strip script tags, inline `on*=` handlers and `javascript:` URIs. */
  def sanitizeHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script.*?</script>", "")
    val noHandlers = regexp_replace(noScript, "(?i)\\son\\w+\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", "")
    regexp_replace(noHandlers, "(?i)javascript:", "")
  }

  /** F3: section-title normalize — strip `1.`, `1.1`, `A)` style prefixes,
    * collapse whitespace, cap at 150 chars. Ref `ingestion/pdf_parser.py:87-92`. */
  def normalizeSectionTitle(c: Column): Column =
    substring(trim(regexp_replace(regexp_replace(c, "^\\s*(\\d+(\\.\\d+)*[.)]?|[A-Za-z][.)])\\s+", ""), "\\s+", " ")), 1, 150)

  /** F10: safe float parse — strip commas/currency, accounting-negative
    * `(123.45)` → -123.45. Ref `ingestion/semantic_enricher.py:504-518`. */
  def parseMoney(c: Column): Column = {
    val cleaned = regexp_replace(c, "[,฿$\\s]|(บาท)|(baht)", "")
    val isParenNeg = cleaned.rlike("^\\(.*\\)$")
    // try_cast: unparseable input → null (a plain cast throws under ANSI mode)
    val core = regexp_replace(cleaned, "[()]", "").try_cast("double")
    when(isParenNeg, -core).otherwise(core)
  }

  private def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  /** Boilerplate removal by line-level text/link density — the
    * Kohlschütter boilerpipe / jusText heuristic that strips nav bars,
    * "related links" blocks and footers from crawled HTML WITHOUT a DOM:
    * a line survives iff its tag-stripped text is at least `minTextLen`
    * chars AND its anchor-text share is at most num/den (integer
    * cross-multiplied — `linkChars·den ≤ textLen·num` — so the density
    * gate is exact, no float division to drift). Pure higher-order array
    * expressions, map-only at any corpus size. Returns the kept lines'
    * stripped text joined by newline. */
  def mainContent(html: Column, minTextLen: Int = 20,
                  linkDensityNum: Int = 1, linkDensityDen: Int = 3): Column = {
    def textLen(line: Column) = length(trim(stripTags(line)))
    def linkChars(line: Column) = aggregate(
      regexp_extract_all(line, lit("(?i)<a[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(stripTags(x)))
    val kept = filter(split(html, "\n"), line =>
      textLen(line) >= minTextLen &&
        linkChars(line) * linkDensityDen <= textLen(line) * linkDensityNum)
    concat_ws("\n", transform(kept, l => trim(stripTags(l))))
  }

  /** UTS #39-style confusable skeleton (bounded, explicit table — not the
    * full Unicode confusables data, the high-traffic subset spam actually
    * uses): Cyrillic and Greek Latin-lookalikes fold to their Latin
    * skeletons, fullwidth ASCII folds to ASCII, NBSP to space, zero-width
    * characters (ZWSP/ZWNJ/ZWJ/WJ/BOM) are REMOVED, then the result is
    * lowercased. Exact dedup on raw bytes cannot see a homoglyph-spoofed
    * copy ('раypal' with Cyrillic ра) — hashing the skeleton can, which
    * makes this the cheap pre-pass before any content-hash dedup at
    * crawl scale (a single codegen'd translate, map-only). Every mapped
    * char is BMP, so Spark's UTF-16 translate and DuckDB's codepoint
    * translate agree. */
  object Confusables {
    /** Cyrillic + Greek homoglyphs (both cases) with their Latin targets. */
    val letterFrom: String = "аеорсхуіѕјёАЕОРСХУІЅЈЁ" + "οικνΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
    val letterTo: String   = "aeopcxyisjeAEOPCXYISJE" + "oikvABEZHIKMNOPTYX"
    /** Fullwidth ASCII block U+FF01..U+FF5E → 0x21..0x7E. */
    val fullwidthFrom: String = (0xff01 to 0xff5e).map(_.toChar).mkString
    val fullwidthTo: String = (0x21 to 0x7e).map(_.toChar).mkString
    /** Removed outright: ZWSP, ZWNJ, ZWJ, WORD JOINER, BOM
      * (escape sequences, never literal invisibles in source). */
    val zeroWidth: String = "\u200B\u200C\u200D\u2060\uFEFF"
    /** Mapped from/to for the skeleton fold (zero-width chars trail the
      * from-string with no counterpart → translate deletes them). */
    val from: String = letterFrom + fullwidthFrom + "\u00A0" + zeroWidth
    val to: String = letterTo + fullwidthTo + " "
    /** Confusable-count probe string (letters + fullwidth, no whitespace
      * mappings): deleting these and diffing lengths counts them. */
    val countable: String = letterFrom + fullwidthFrom
  }

  /** The skeleton fold itself: translate + lowercase, one codegen'd map
    * expression. Hash this, not the raw text, to catch homoglyph dups. */
  def confusableSkeleton(c: Column): Column =
    lower(translate(c, Confusables.from, Confusables.to))
}
