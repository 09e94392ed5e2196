package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (SURVEY.md §4
  * custom-Expression candidate; prompt family: similarity search).
  *
  * Exactly mirrors the HOF formulation it replaces —
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)` — as a strict left-to-right double fold, so the IEEE
  * result is bit-identical to both the previous expression and DuckDB's
  * `list_dot_product` (the oracle relies on this). The HOF chain is
  * interpreted per row (Spark's higher-order functions don't codegen);
  * this expression runs inside whole-stage codegen, which matters on the
  * candidate-verify joins (hundreds of thousands of 64-dim dot products
  * per d5 run at sf0.1).
  *
  * Null semantics match the HOF version: mismatched lengths or a null
  * element yield null.
  */
case class ArrayDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  // null is produced for length mismatch / null elements even when both
  // children are non-nullable — without this override consumers may skip
  // the isNull check and read the uninitialized 0.0 slot
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // DecimalType is NumericType but has no fixed-width accessor in getD /
    // CodeGenerator.getValue's primitive cast — reject it at analysis time
    // rather than failing at runtime (cast the column to double first)
    def ok(t: DataType) = t match {
      case ArrayType(et, _) => et.isInstanceOf[NumericType] && !et.isInstanceOf[DecimalType]
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two non-decimal numeric arrays, got ${left.dataType} and ${right.dataType}")
  }

  private def getD(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case other => throw new UnsupportedOperationException(s"array_dot element type $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      acc += getD(aa, lt, i) * getD(bb, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sawNull = ctx.freshName("sawNull")
      val la = CodeGenerator.getValue(a, elemType(left), i)
      val rb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $sawNull = false;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $sawNull = true; break; }
         |    $acc += ((double)($la)) * ((double)($rb));
         |  }
         |  if ($sawNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  val info = new ExpressionInfo(classOf[ArrayDotExpr].getName, "array_dot")
}
