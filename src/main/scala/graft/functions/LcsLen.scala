package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over two token arrays — the ROUGE-L
  * kernel (SURVEY.md §4 custom-Expression candidate; prompt family: text
  * analysis / eval).
  *
  * The classic O(n·m) two-row DP as a compiled loop. The nested-HOF
  * formulation it replaces (`aggregate(aggregate(...))` building the DP
  * row as an array value) is interpreted per row AND allocates one
  * Catalyst array per DP cell append — measured 40 s for ev3 at sf0.1
  * versus sub-second compiled; at crawl scale the HOF shape is
  * unusable. Runs inside whole-stage codegen via a static-call
  * `defineCodeGen` (the `DifflibRatio` pattern).
  *
  * Null elements never match anything (our token arrays are null-free;
  * the rule only pins the semantics). Exact integer output — bit-parity
  * with any engine's LCS by definition.
  */
object LcsLen {

  def lcs(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val as = Array.tabulate(n)(i => if (a.isNullAt(i)) null else a.getUTF8String(i))
    val bs = Array.tabulate(m)(j => if (b.isNullAt(j)) null else b.getUTF8String(j))
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai: UTF8String = as(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai != null && bs(j - 1) != null && ai.equals(bs(j - 1))) prev(j - 1) + 1
          else math.max(cur(j - 1), prev(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

case class LcsLenExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_len"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lcs_len requires two string arrays, got ${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsLen.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LcsLen.lcs($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
