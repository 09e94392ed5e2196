package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-wise Levenshtein distance for the record-linkage family.
  *
  * Spark's native `levenshtein` counts UTF-16 CHARS; DuckDB 1.0's (the
  * correctness oracle, and the semantics `editdist3`-style byte matchers
  * share) counts UTF-8 BYTES — 'é' is one char but two byte positions, so
  * 'café'→'cafe' is char-distance 1 but byte-distance 2, and a Thai-name
  * corpus (the reference's own domain, 3 bytes per character) diverges on
  * EVERY edit. This expression walks `UTF8String.getBytes` directly —
  * the same pinning discipline as [[JaroWinkler]] — so entity-resolution
  * scoring agrees with the oracle on any input, not just ASCII
  * (Round10Spec runs a live python-duckdb differential over random
  * multi-byte strings).
  *
  * Unit-cost Wagner–Fischer with two rolling rows: O(la·lb) time,
  * O(min-side) memory, no allocation beyond one int row per call. A
  * native `BinaryExpression` with `doGenCode` so blocked-pair verify
  * stays inside whole-stage codegen. Scale shape: map-side work over
  * blocking-join candidates, never a cross product.
  */
object LevenshteinBytes {

  /** DuckDB-exact byte-level edit distance (insert/delete/substitute,
    * unit costs). Returns Long to match DuckDB's BIGINT. */
  def dist(ua: UTF8String, ub: UTF8String): Long = {
    var a = ua.getBytes
    var b = ub.getBytes
    if (a.length < b.length) { val t = a; a = b; b = t } // row = shorter side
    val lb = b.length
    if (lb == 0) return a.length.toLong
    val row = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { row(j) = j; j += 1 }
    var i = 1
    while (i <= a.length) {
      var prev = row(0) // dp(i-1, j-1)
      row(0) = i
      j = 1
      while (j <= lb) {
        val cur = row(j) // dp(i-1, j)
        var best = prev + (if (a(i - 1) == b(j - 1)) 0 else 1)
        if (cur + 1 < best) best = cur + 1
        if (row(j - 1) + 1 < best) best = row(j - 1) + 1
        row(j) = best
        prev = cur
        j += 1
      }
      i += 1
    }
    row(lb).toLong
  }
}

/** `levenshtein_bytes(string, string)` → BIGINT byte-level edit distance
  * (DuckDB `levenshtein` parity). */
case class LevenshteinBytesExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  // analysis-time type check: non-string arguments fail cleanly instead of
  // a runtime ClassCastException in nullSafeEval
  override def inputTypes = Seq(StringType, StringType)
  override def prettyName: String = "levenshtein_bytes"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinBytes.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LevenshteinBytes.dist($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
