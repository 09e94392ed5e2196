package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro-Winkler similarity for the record-linkage family
  * (SURVEY.md §2 extension: entity resolution; ref
  * `ingestion/deduplicator.py` scores near-identity with ratio-style
  * string similarity — Jaro-Winkler is the record-linkage standard).
  *
  * The algorithm is pinned BIT-EXACTLY to DuckDB 1.0's
  * `jaro_similarity` / `jaro_winkler_similarity` (the correctness
  * oracle), differential-tested over 4000 random cases:
  *  - either side empty → 0.0 (including both empty — NOT the classic 1.0);
  *  - match window = max(la,lb)/2 - 1, clamped to ≥ 0 (so 1-char equal
  *    strings still match);
  *  - greedy left-to-right flagging: a[i] pairs with the FIRST unflagged
  *    equal b[j] inside the window;
  *  - transpositions t = (mismatched matched-sequence positions) / 2,
  *    INTEGER division;
  *  - jaro = (m/la + m/lb + (m-t)/m) / 3, evaluated with /3 (not *(1/3)) —
  *    the double rounding differs;
  *  - Winkler boost only when jaro > 0.7 (strict): + prefix·0.1·(1−jaro),
  *    common prefix capped at 4.
  *
  * Native `BinaryExpression`s with `doGenCode` so blocked-pair scoring
  * stays inside whole-stage codegen. Scale shape: scoring is map-side
  * work over candidate pairs produced by a blocking join — the plan never
  * scores the full cross product (see er2_record_linkage).
  */
object JaroWinkler {

  /** DuckDB-exact Jaro similarity. UTF-8 BYTES, not UTF-16 chars:
    * DuckDB's implementation walks the raw string bytes, so 'é' counts
    * as two positions — probed live over 500 random non-ASCII cases
    * (mixed 1/2/3-byte code points), zero mismatches byte-wise vs
    * guaranteed divergence char-wise ('café'/'cafe' has lengths 5/4 in
    * bytes but 4/4 in chars, changing the match window and the score). */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var w = math.max(la, lb) / 2 - 1
    if (w < 0) w = 0
    val fa = new Array[Boolean](la)
    val fb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb - 1, i + w)
      var j = lo
      var done = false
      while (!done && j <= hi) {
        if (!fb(j) && a(i) == b(j)) {
          fa(i) = true; fb(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatches between the two matched-byte sequences, in order
    var mism = 0
    var ai = 0
    var bi = 0
    var k = 0
    while (k < m) {
      while (!fa(ai)) ai += 1
      while (!fb(bi)) bi += 1
      if (a(ai) != b(bi)) mism += 1
      ai += 1; bi += 1; k += 1
    }
    val t = mism / 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3
  }

  /** DuckDB-exact Jaro-Winkler: boost iff jaro > 0.7, common prefix
    * capped at 4 BYTES (also probed — the cap is byte-positional). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.getBytes
    val b = ub.getBytes
    val n = math.min(4, math.min(a.length, b.length))
    var p = 0
    while (p < n && a(p) == b(p)) p += 1
    j + p * 0.1 * (1 - j)
  }
}

case class JaroExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.jaro($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
