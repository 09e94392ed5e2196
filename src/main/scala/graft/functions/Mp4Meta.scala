package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native MP4/ISO-BMFF metadata walk — duration/timescale from the
  * `moov/mvhd` box plus a `trak` count, completing the media-header family
  * (m2 image dims, m5 WAV, m6 TIFF) for video columns (SURVEY.md §2.1 S2;
  * prompt family: multimodal; ref stores uploads as opaque media blobs,
  * `ingestion/document_processor.py` routes on magic bytes).
  *
  * ISO-BMFF (ISO 14496-12) is a tree of length-prefixed boxes:
  * `[size:4 BE][type:4][payload…]`, where `size == 1` switches to a 64-bit
  * `largesize` following the type (the >4 GiB mdat case) and `size == 0`
  * means "extends to end of file" (legal for the last top-level box only).
  * The walk is two bounded loops:
  *
  *  1. top level: hop box-to-box (skipping `ftyp`/`free`/`mdat`/… by their
  *     declared sizes — metadata-at-end layouts put a multi-GB `mdat`
  *     BEFORE `moov`) until `moov` is found;
  *  2. inside `moov`: visit each child, recording the first `mvhd` and
  *     counting `trak` boxes, until the moov extent is consumed.
  *
  * `mvhd` layout after its box header: version(1) flags(3), then
  * version 0 → creation(4) modification(4) timescale(4) duration(4);
  * version 1 → creation(8) modification(8) timescale(4) duration(8).
  *
  * Fail-to-null, never garbage (the imageDims contract): non-MP4 magic,
  * truncated headers, malformed sizes (size in 2..7, a box overrunning its
  * parent, a largesize < 16), a moov with no mvhd, or an unknown mvhd
  * version all yield a null struct. Both loops are hop-bounded so a
  * hostile size chain can't spin. Reads only header bytes — never scans
  * payload content, so cost is O(boxes visited), not O(bytes).
  */
object Mp4Meta {

  val schema: StructType = StructType(Seq(
    StructField("timescale", IntegerType),
    StructField("duration", LongType),
    StructField("n_tracks", IntegerType)))

  /** Strict big-endian read of exactly `len` bytes at 0-based `pos`;
    * -1 when out of range (callers treat negative as failure — a real
    * 64-bit size with the top bit set is already malformed for a box). */
  private def be(b: Array[Byte], pos: Long, len: Int): Long = {
    if (pos < 0 || pos + len > b.length) return -1L
    var v = 0L
    var i = pos
    while (i < pos + len) { v = (v << 8) | (b(i.toInt) & 0xffL); i += 1 }
    v
  }

  private def typeIs(b: Array[Byte], pos: Long, t: String): Boolean = {
    if (pos + 4 > b.length) return false
    var i = 0
    while (i < 4) {
      if (b((pos + i).toInt) != t.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** (contentStart, boxEnd) for the box at `pos`, both 0-based; null on a
    * malformed/truncated header or a box overrunning `limit`. */
  private def boxExtent(b: Array[Byte], pos: Long, limit: Long): (Long, Long) = {
    if (pos + 8 > limit) return null
    val size = be(b, pos, 4)
    if (size == 1L) {
      val large = be(b, pos + 8, 8)
      if (large < 16L || pos + large > limit) return null
      (pos + 16, pos + large)
    } else if (size == 0L) {
      (pos + 8, limit) // to end-of-file
    } else {
      if (size < 8L || pos + size > limit) return null
      (pos + 8, pos + size)
    }
  }

  private def intOf(v: Long): java.lang.Integer =
    if (v >= 1L && v <= Int.MaxValue.toLong) Integer.valueOf(v.toInt) else null

  /** The full walk; null when the payload is not a parseable MP4. */
  def meta(b: Array[Byte], maxHops: Int = 16): InternalRow = {
    if (b == null || b.length < 8) return null
    // an ISO-BMFF file opens with a box whose type is printable FourCC;
    // require the conventional ftyp/styp leader OR an immediate moov
    // (fragmented/odd-but-valid files) so arbitrary binaries fail fast
    if (!(typeIs(b, 4, "ftyp") || typeIs(b, 4, "styp") || typeIs(b, 4, "moov")))
      return null
    val eof = b.length.toLong
    // 1. top-level hop to moov
    var pos = 0L
    var moov: (Long, Long) = null
    var hop = 0
    while (hop < maxHops && moov == null) {
      val ext = boxExtent(b, pos, eof)
      if (ext == null) return null
      if (typeIs(b, pos + 4, "moov")) moov = ext
      else if (ext._2 <= pos) return null
      else pos = ext._2
      if (pos >= eof && moov == null) return null
      hop += 1
    }
    if (moov == null) return null
    // 2. child walk: first mvhd + trak count
    var child = moov._1
    var mvhd = -1L
    var traks = 0L
    hop = 0
    while (hop < maxHops && child < moov._2) {
      val ext = boxExtent(b, child, moov._2)
      if (ext == null) return null
      if (mvhd < 0 && typeIs(b, child + 4, "mvhd")) mvhd = ext._1
      if (typeIs(b, child + 4, "trak")) traks += 1
      if (ext._2 <= child) return null
      child = ext._2
      hop += 1
    }
    if (mvhd < 0) return null
    val version = be(b, mvhd, 1)
    val (ts, dur) = version match {
      case 0L => (be(b, mvhd + 12, 4), be(b, mvhd + 16, 4))
      case 1L => (be(b, mvhd + 20, 4), be(b, mvhd + 24, 8))
      case _ => return null
    }
    if (ts < 0L || dur < 0L) return null
    new GenericInternalRow(Array[Any](intOf(ts), java.lang.Long.valueOf(dur),
      Integer.valueOf(traks.toInt)))
  }
}

/** `mp4_meta(binary)` → `struct<timescale:int,duration:bigint,n_tracks:int>`
  * — compiled single-pass box walk, codegen via a static call (the
  * ImageDimsExpr pattern); null child or unparseable payload → null. */
case class Mp4MetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Mp4Meta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"mp4_meta requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Mp4Meta.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp4Meta.meta($c, 16);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
