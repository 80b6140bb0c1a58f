package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric arrays, accumulating in
  * double precision with a sequential left-to-right fold — the exact
  * summation order DuckDB's `list_dot_product` uses, so both engines produce
  * bit-identical doubles (required by the driver's hash-compare oracle).
  *
  * This replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation: Spark evaluates HOF lambdas interpreted (one closure call
  * per element per row), which measured ~36µs per 64-dim pair; this
  * expression participates in whole-stage codegen as a tight fused loop.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be array<float> or array<double>, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def getter(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  // A null ELEMENT — or a dimension mismatch — nulls the whole product
  // (matching the null-padded `aggregate(zip_with(...))` formulation it
  // replaced), so the expression is nullable even over non-null array
  // columns. Mismatched lengths must NOT silently truncate: a truncated
  // dot product is a plausible-but-wrong score, while a null is detectable
  // downstream (and desyncs loudly from DuckDB's list_dot_product, which
  // errors on mismatch).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return null
    val aFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ga = getter(left.dataType)
      val gb = getter(right.dataType)
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$ga($i) * (double) $b.$gb($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object ArrayDotProduct {
  /** Column-level entry point: `dot(a, b)` as a codegen'd expression. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
