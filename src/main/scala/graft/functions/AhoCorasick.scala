package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching — the 100k-term-blocklist scale
  * path (prompt family: text analysis; ref greps keyword lists one regex
  * at a time in ingestion/document_classifier.py — fine for a dozen
  * terms, O(text × patterns); this is O(text + matches) regardless of
  * dictionary size, the difference between a safety/taxonomy pass being
  * one cheap map stage or the pipeline bottleneck at 100 TB).
  *
  * Semantics (pinned, engine-replayable): counts EVERY occurrence of
  * every pattern — overlapping and nested matches included ("aa" occurs
  * 3× in "aaaa"; "ark"/"park"/"spark" all match inside "spark") — i.e.
  * per pattern p, the number of positions i with text[i, i+|p|) == p.
  * Any engine can replay that definition with a position scan; the
  * automaton is just the fast way to compute it. Case-sensitive (callers
  * lower() both sides); char-based (UTF-16 code units — identical to
  * code-point semantics for BMP text, which the corpus contract here is).
  *
  * The automaton builds once from the foldable pattern array (driver-side
  * at plan time via the codegen reference, or lazily per executor on the
  * interpreted path) and is immutable + serializable; per-row work shares
  * it read-only.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(p => p != null && p.nonEmpty),
    "patterns must be non-null and non-empty")

  // trie: goto per node; ends(n) = pattern indexes ending exactly at n
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val ends = scala.collection.mutable.ArrayBuffer(Array.empty[Int])

  for ((p, idx) <- patterns.zipWithIndex) {
    var node = 0
    for (c <- p) {
      val nxt = gotoMaps(node).get(Character.valueOf(c))
      node = if (nxt != null) nxt.intValue
      else {
        gotoMaps += new java.util.HashMap[Character, Integer]()
        ends += Array.empty[Int]
        gotoMaps(node).put(Character.valueOf(c), Integer.valueOf(gotoMaps.size - 1))
        gotoMaps.size - 1
      }
    }
    ends(node) = ends(node) :+ idx // duplicate patterns each keep counting
  }

  private val fail = new Array[Int](gotoMaps.size)
  // nearest PROPER dict-suffix node (one with non-empty ends); 0 = none
  private val dict = new Array[Int](gotoMaps.size)
  locally { // classic BFS failure-link construction
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue
      dict(u) = if (ends(fail(u)).nonEmpty) fail(u) else dict(fail(u))
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
        val fn = gotoMaps(f).get(c)
        fail(v.intValue) = if (fn != null && fn.intValue != v.intValue) fn.intValue else 0
        queue.add(v)
      }
    }
  }

  /** Per-pattern ALL-occurrence counts for one row: O(|text| + matches). */
  def counts(text: UTF8String): ArrayData = {
    val s = text.toString
    val cnt = new Array[Int](patterns.length)
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      while (node != 0 && !gotoMaps(node).containsKey(c)) node = fail(node)
      val nxt = gotoMaps(node).get(c)
      node = if (nxt != null) nxt.intValue else 0
      var d = if (ends(node).nonEmpty) node else dict(node)
      while (d != 0) {
        val es = ends(d)
        var k = 0
        while (k < es.length) { cnt(es(k)) += 1; k += 1 }
        d = dict(d)
      }
      i += 1
    }
    new GenericArrayData(cnt.map(Int.box))
  }
}

/** `ac_counts(text, array<string>)` → `array<int>` of ALL-occurrence
  * counts aligned to the (foldable) pattern array. Null text → null. */
case class AhoCorasickCountsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ac_counts"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (StringType, ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckFailure("ac_counts pattern array must be foldable " +
        "(the automaton builds once at plan time, not per row)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ac_counts requires (string, array<string>), got ($l, $r)")
  }

  @transient private lazy val automaton: AcAutomaton = {
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    require(arr != null, "ac_counts pattern array must not be null")
    new AcAutomaton((0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), "ac_counts patterns must not contain nulls")
      arr.getUTF8String(i).toString
    }.toArray)
  }

  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.counts(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $acRef.counts($t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
