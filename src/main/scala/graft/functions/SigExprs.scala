package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass signature builders for the dedup family (SURVEY.md §4
  * custom-Expression candidates; prompt family: deduplication).
  *
  * Both replace chains of interpreted higher-order expressions with a
  * single compiled scan per row, byte-identical to the HOF formulations
  * they replace (and therefore to the DuckDB oracle SQL, which mirrors
  * those formulations):
  *
  *  - [[MinHashMinsExpr]]: the rotation-permutation MinHash — for
  *    permutation i, the lexicographic min over shingle digests of the hex
  *    string rotated by `(i*7)%31+1` chars. The HOF form runs one
  *    interpreted transform+array_min pass per permutation; this runs all
  *    permutations in one scan.
  *  - [[SimHashBitsExpr]]: per-bit ±1 votes by the j-th hex char of each
  *    token digest (≥ '8' votes +1), emitted as a 0/1 string. The HOF form
  *    zip_withs a bits-wide counter array per token, interpreted.
  */
object SigExprs {

  /** substring(h, r+1, 32-r) ++ substring(h, 1, r) — byte-exact mirror of
    * the SQL rotation, general-length safe (md5 hex is always 32). */
  private def rotated(h: Array[Byte], r: Int): UTF8String = {
    val len = h.length
    val c1 = math.max(0, math.min(32 - r, len - r))
    val c2 = math.min(r, len)
    val out = new Array[Byte](c1 + c2)
    if (c1 > 0) System.arraycopy(h, r, out, 0, c1)
    if (c2 > 0) System.arraycopy(h, 0, out, c1, c2)
    UTF8String.fromBytes(out)
  }

  def minhashMins(hashes: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[AnyRef](numHashes)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      // array_min semantics: null elements are skipped
      if (!hashes.isNullAt(i)) {
        val h = hashes.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          val u = rotated(h, (k * 7) % 31 + 1)
          if (mins(k) == null || u.compareTo(mins(k).asInstanceOf[UTF8String]) < 0) mins(k) = u
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct character n-grams in first-occurrence order — code-point
    * stepping (matches SQL substring semantics and the previous
    * split("")+zip_with formulation on BMP text); a text shorter than n
    * yields itself as the single gram. */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val total = cps.length
    if (total < n) return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= total) {
      seen.add(new String(cps, i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct space-joined word w-shingles in first-occurrence order;
    * fewer than w tokens yield the whole token list as one shingle (the
    * zip-shift HOF fallback semantics, concat_ws-style). */
  def wordShingles(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    if (n < w)
      return new GenericArrayData(Array[Any](UTF8String.concatWs(sep, words: _*)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i + w <= n) {
      val slice = new Array[UTF8String](w)
      System.arraycopy(words, i, slice, 0, w)
      seen.add(UTF8String.concatWs(sep, slice: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".getBytes

  private def md5hex(bytes: Array[Byte]): UTF8String = {
    val md = md5Local.get(); md.reset()
    val dig = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(dig(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Winnowing (Schleimer et al.): md5-hex every POSITIONAL character
    * k-gram (code-point stepping; text shorter than k hashes whole), then
    * the lexicographic min of every w-wide sliding hash window (fewer
    * than w hashes → one window over all), distinct in first-occurrence
    * order. One compiled pass; the HOF formulation re-evaluated the hash
    * chain inside the window lambda (O(L²) md5 calls) and per-position
    * substring is O(position) on UTF8String. */
  def winnowHashes(text: UTF8String, kIn: Int, wIn: Int): ArrayData = {
    // SQL-callable with arbitrary literals: clamp degenerate k/w to 1
    // (charNgrams-style) instead of crashing the task
    val k = math.max(kIn, 1); val w = math.max(wIn, 1)
    val s = text.toString
    val cps = s.codePoints().toArray
    val total = cps.length
    val hs: Array[UTF8String] =
      if (total < k) Array(md5hex(text.getBytes))
      else {
        val arr = new Array[UTF8String](total - k + 1)
        var i = 0
        while (i + k <= total) {
          arr(i) = md5hex(new String(cps, i, k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          i += 1
        }
        arr
      }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (hs.length < w) {
      var m = hs(0); var i = 1
      while (i < hs.length) { if (hs(i).compareTo(m) < 0) m = hs(i); i += 1 }
      seen.add(m)
    } else {
      var j = 0
      while (j + w <= hs.length) {
        var m = hs(j); var i = j + 1
        while (i < j + w) { if (hs(i).compareTo(m) < 0) m = hs(i); i += 1 }
        seen.add(m)
        j += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j2 = 0
    while (it.hasNext) { out(j2) = it.next(); j2 += 1 }
    new GenericArrayData(out)
  }

  /** Unicode NFC normalization (canonical composition) — the normalize-
    * before-hash step every dedup pipeline needs so 'é' and 'e'+COMBINING
    * ACUTE hash identically. JDK Normalizer implements the same Unicode
    * standard algorithm as DuckDB's utf8proc-backed nfc_normalize. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    // pure-ASCII fast path: one byte per char ⇒ no combining sequences ⇒
    // already NFC, no String allocation at all (most corpora hit this)
    if (text.numBytes == text.numChars) return text
    val s = text.toString
    // second fast path: normalized already, return the original buffer
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def simhashBits(hashes: ArrayData, bits: Int): UTF8String = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) {
        // HOF parity: a null digest votes -1 on every bit (when(null rlike…)
        // falls through to otherwise(-1))
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 }
      } else {
        val h = hashes.getUTF8String(i).getBytes
        var j = 0
        while (j < bits) {
          // [89a-f] on lowercase hex; positions past the digest vote -1
          val up = j < h.length && {
            val c = h(j)
            (c >= '8' && c <= '9') || (c >= 'a' && c <= 'f')
          }
          votes(j) += (if (up) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) { out(j) = if (votes(j) >= 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }

  /** Content-defined chunk boundaries (Rabin-Karp rolling hash): the
    * 1-based END positions (in code points) of every `w`-wide window
    * whose polynomial hash (base 257 mod 1e9+7, computed over code
    * points) is divisible by `div` — the restic/Borg/LBFS chunking rule,
    * giving expected chunk length ≈ `div` beyond the window. ONE O(L)
    * pass per document: the window hash rolls (remove c_out·B^(w-1),
    * multiply by B, add c_in, all mod M with positive folding), which is
    * bit-identical to re-folding each window from zero — the form the
    * DuckDB oracle replays in O(L·w). Boundaries move only if the LOCAL
    * w-char context changes, so an edit reshuffles one chunk's
    * neighborhood instead of re-cutting the whole document — the property
    * that makes downstream chunk-level dedup edit-stable. */
  def cdcBoundaries(text: UTF8String, w: Int, div: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints.toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    if (w >= 1 && div >= 1 && n >= w) {
      val B = 257L
      val M = 1000000007L
      var bw = 1L
      var k = 1
      while (k < w) { bw = bw * B % M; k += 1 }
      var h = 0L
      var i = 0
      while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
      if (h % div == 0) out += w
      while (i < n) {
        h = ((h - cps(i - w) * bw % M) % M + M) % M
        h = (h * B + cps(i)) % M
        i += 1
        if (h % div == 0) out += i
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Wide SimHash: vote position j reads BIT j of the digest (hex char
    * j/4, bit 3-(j%4), MSB-first) instead of only each hex char's top
    * bit — one md5 yields up to 128 independent vote positions, so the
    * 64-bit production fingerprint (Manku's sizing) needs no second hash
    * pass. Null digests vote -1 everywhere (same convention as
    * [[simhashBits]]). */
  def simhashBits64(hashes: ArrayData, bits: Int): UTF8String = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) {
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 }
      } else {
        val h = hashes.getUTF8String(i).getBytes
        var j = 0
        while (j < bits) {
          val ci = j >> 2
          val up = ci < h.length && {
            val c = h(ci)
            val v = if (c >= '0' && c <= '9') c - '0'
                    else if (c >= 'a' && c <= 'f') c - 'a' + 10
                    else 0
            ((v >> (3 - (j & 3))) & 1) == 1
          }
          votes(j) += (if (up) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) { out(j) = if (votes(j) >= 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }
}

/** `minhash_mins(array<string>, n)` → array<string> of rotation-permutation
  * minima. `n` must be a foldable integer literal. */
case class MinHashMinsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_mins"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigExprs.minhashMins(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigExprs.minhashMins($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `simhash_bits(array<string>, bits)` → 0/1 fingerprint string. */
case class SimHashBitsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigExprs.simhashBits(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigExprs.simhashBits($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `simhash_bits64(array<string>, bits)` → 0/1 fingerprint string with
  * bit-level (not hex-char-level) votes — up to 128 bits per md5. */
case class SimHashBits64Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigExprs.simhashBits64(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigExprs.simhashBits64($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `char_ngrams(string, n)` → array<string> of distinct n-grams. */
case class CharNgramsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigExprs.charNgrams(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigExprs.charNgrams($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `word_shingles(array<string>, w)` → array<string> of distinct shingles. */
case class WordShinglesExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigExprs.wordShingles(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigExprs.wordShingles($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `winnow_hashes(string, k, w)` → array<string> of distinct winnowed
  * window-min md5s (positional k-grams). */
case class WinnowHashesExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    SigExprs.winnowHashes(a.asInstanceOf[UTF8String], b.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.SigExprs.winnowHashes($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `cdc_boundaries(string, w, div)` → array<int> of 1-based window-end
  * positions where the rolling hash is divisible by div. */
case class CdcBoundariesExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    SigExprs.cdcBoundaries(a.asInstanceOf[UTF8String], b.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.SigExprs.cdcBoundaries($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `nfc_normalize(string)` → NFC-composed string. */
case class NfcNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(a: Any): Any =
    SigExprs.nfcNormalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SigExprs.nfcNormalize($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize { val info = new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize") }
object WinnowHashes { val info = new ExpressionInfo(classOf[WinnowHashesExpr].getName, "winnow_hashes") }
object WordShingles { val info = new ExpressionInfo(classOf[WordShinglesExpr].getName, "word_shingles") }
object MinHashMins { val info = new ExpressionInfo(classOf[MinHashMinsExpr].getName, "minhash_mins") }
object SimHashBits { val info = new ExpressionInfo(classOf[SimHashBitsExpr].getName, "simhash_bits") }
object SimHashBits64 { val info = new ExpressionInfo(classOf[SimHashBits64Expr].getName, "simhash_bits64") }
object CdcBoundaries { val info = new ExpressionInfo(classOf[CdcBoundariesExpr].getName, "cdc_boundaries") }
object CharNgrams { val info = new ExpressionInfo(classOf[CharNgramsExpr].getName, "char_ngrams") }
