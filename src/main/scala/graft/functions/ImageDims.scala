package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native five-format image-dimension decode — one compiled byte walk per
  * row replacing the [[graft.ops.Multimodal.imageDims]] Column tree
  * (SURVEY.md §2.1 S2; prompt family: multimodal).
  *
  * The Column form is the SEMANTICS REFERENCE: correct and oracle-gated,
  * but its hex/conv/substring branch tree re-inlines the payload
  * subexpressions once per format probe (the JPEG marker walk alone
  * expands to 12 folded hops), which both bloats codegen and re-evaluates
  * bytes the compiled loop reads once — the lcs_len/x11 lesson applied to
  * m2/m6. This Expression evaluates the same decision tree in plain JVM
  * code; Round6Spec pins bit-parity against the Column form over the full
  * fixture family plus truncation/garbage sweeps.
  *
  * Parity subtleties deliberately replicated from the Column tree:
  *  - `substring(payload, pos, len)` past the end yields the AVAILABLE
  *    bytes — a partial big-endian read parses just those bytes; a fully
  *    out-of-range read is `conv('') = NULL` (here: null with absorption
  *    through later arithmetic, exactly the Column null semantics).
  *  - little-endian reads concat per-byte hex from high position down,
  *    SKIPPING out-of-range positions (hex('') = '').
  *  - the JPEG walk's frozen/failed accumulator and its null-absorbing
  *    `otherwise(acc + 2 + be16)` branch.
  *  - BMP's OS/2 core-header branch and two's-complement top-down height.
  *  - fail-to-null everywhere: no input yields garbage or a throw.
  */
object ImageDims {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Big-endian value of the available bytes in [pos, pos+len) (1-based);
    * null when no byte is in range (the conv(hex(substring)) semantics). */
  private def beVal(b: Array[Byte], pos: Long, len: Int): java.lang.Long = {
    val start = pos - 1
    if (start < 0 || start >= b.length) return null
    val end = math.min(start + len, b.length.toLong)
    var v = 0L
    var i = start
    while (i < end) { v = (v << 8) | (b(i.toInt) & 0xffL); i += 1 }
    v
  }

  /** Little-endian: per-byte hex concatenated from position pos+len-1
    * down to pos with out-of-range positions skipped, then parsed — so a
    * truncated payload contributes only its present bytes, in the same
    * order the Column `concat(hex...)` builds them. */
  private def leVal(b: Array[Byte], pos: Long, len: Int): java.lang.Long = {
    var v = 0L
    var any = false
    var i = pos + len - 1
    while (i >= pos) {
      val idx = i - 1
      if (idx >= 0 && idx < b.length) { v = (v << 8) | (b(idx.toInt) & 0xffL); any = true }
      i -= 1
    }
    if (any) v else null
  }

  private def dimOf(v: java.lang.Long): java.lang.Integer =
    if (v != null && v >= 1L && v <= Int.MaxValue.toLong) Integer.valueOf(v.toInt) else null

  private def isSof(m: Long): Boolean =
    m >= 192L && m <= 207L && m != 196L && m != 200L && m != 204L

  /** The bounded JPEG SOF marker walk (12 hops, same freeze/fail/null
    * accumulator as the Column fold). */
  private def jpegDims(b: Array[Byte], maxHops: Int = 12): (java.lang.Integer, java.lang.Integer) = {
    var acc: java.lang.Long = 3L
    var hop = 0
    while (hop < maxHops && acc != null && acc > 0) {
      val marker = beVal(b, acc, 1)
      val m = beVal(b, acc + 1, 1)
      if (marker != null && marker != 255L) acc = 0L
      else if (m != null && isSof(m)) acc = -acc
      else if (m != null && (m == 218L || m == 217L)) acc = 0L
      else {
        val step = beVal(b, acc + 2, 2)
        acc = if (step == null || marker == null) null else java.lang.Long.valueOf(acc + 2 + step)
      }
      hop += 1
    }
    if (acc == null || acc >= 0) (null, null)
    else {
      val sof = -acc
      (dimOf(beVal(b, sof + 7, 2)), dimOf(beVal(b, sof + 5, 2)))
    }
  }

  /** The bounded 4-entry TIFF IFD scan under data-selected endianness. */
  private def tiffDims(b: Array[Byte], maxEntries: Int = 4): (java.lang.Integer, java.lang.Integer) = {
    val isLe = b.length >= 2 && b(0) == 'I' && b(1) == 'I'
    def u(pos: java.lang.Long, len: Int): java.lang.Long = {
      if (pos == null) return null
      // hostile/corrupt offsets past int range fail to null before any
      // downstream read (the Column guard)
      if (pos > Int.MaxValue.toLong - len) return null
      if (isLe) leVal(b, pos, len) else beVal(b, pos, len)
    }
    val ifdBase = u(5L, 4)
    val ifd: java.lang.Long = if (ifdBase == null) null else java.lang.Long.valueOf(ifdBase + 1L)
    val n = u(ifd, 2)
    def entry(i: Long): java.lang.Long = if (ifd == null) null else java.lang.Long.valueOf(ifd + 2 + i * 12)
    def find(tag: Long): java.lang.Long = {
      if (n == null) return null
      var i = 0L
      while (i < maxEntries) {
        if (i < n) {
          val tg = u(entry(i), 2)
          if (tg != null && tg == tag) {
            val t = u(if (entry(i) == null) null else java.lang.Long.valueOf(entry(i) + 2), 2)
            val v: java.lang.Long =
              if (t != null && t == 3L) u(java.lang.Long.valueOf(entry(i) + 8), 2)
              else if (t != null && t == 4L) u(java.lang.Long.valueOf(entry(i) + 8), 4)
              else null
            if (v != null) return v
          }
        }
        i += 1
      }
      null
    }
    (dimOf(find(256L)), dimOf(find(257L)))
  }

  private def signedAbs32(v: java.lang.Long): java.lang.Long =
    if (v == null) null
    else {
      val s = if (v > Int.MaxValue.toLong) v - 4294967296L else v.longValue
      java.lang.Long.valueOf(math.abs(s))
    }

  private def asciiAt(b: Array[Byte], pos: Int, s: String): Boolean = {
    if (b.length < pos - 1 + s.length) return false
    var i = 0
    while (i < s.length) {
      if (b(pos - 1 + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def row(fmt: String, w: java.lang.Integer, h: java.lang.Integer): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** The full dispatch: null (not a row of nulls) when no magic matches. */
  def dims(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val isPng = b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a
    if (isPng) return row("png", dimOf(beVal(b, 17, 4)), dimOf(beVal(b, 21, 4)))
    if (asciiAt(b, 1, "GIF87a") || asciiAt(b, 1, "GIF89a"))
      return row("gif", dimOf(leVal(b, 7, 2)), dimOf(leVal(b, 9, 2)))
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      val (w, h) = jpegDims(b)
      return row("jpeg", w, h)
    }
    val isTiff = b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a && b(3) == 0) ||
       (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 0x2a))
    if (isTiff) {
      val (w, h) = tiffDims(b)
      return row("tiff", w, h)
    }
    if (asciiAt(b, 1, "BM")) {
      val dib = leVal(b, 15, 4)
      if (dib != null && (dib == 40L || dib == 52L || dib == 56L || dib == 108L || dib == 124L))
        return row("bmp", dimOf(signedAbs32(leVal(b, 19, 4))), dimOf(signedAbs32(leVal(b, 23, 4))))
      if (dib != null && dib == 12L)
        return row("bmp", dimOf(leVal(b, 19, 2)), dimOf(leVal(b, 21, 2)))
      return null
    }
    null
  }
}

/** `image_dims(binary)` → `struct<format:string,width:int,height:int>` —
  * compiled single-pass dispatch, codegen via a static call (the
  * LcsLenExpr pattern); null child or unrecognized magic → null struct. */
case class ImageDimsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageDims.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_dims requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageDims.dims($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
