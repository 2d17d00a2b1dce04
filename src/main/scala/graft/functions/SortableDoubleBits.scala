package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `graft_sortable_bits(v)` — the IEEE-754 bits of a double, transformed
  * so UNSIGNED long order equals numeric order:
  * `s < 0 ? ~s : s | Long.MinValue` for `s = doubleToLongBits(v)`.
  *
  * This makes order-preserving, data-independent binning of doubles a
  * single codegen'd expression: `shiftrightunsigned(key, 64-b)` yields a
  * 2^b-bucket histogram whose bucket order equals value order without
  * first scanning for min/max — the trick behind the one-pass histogram
  * in [[graft.operators.Percentiles]]. (Radix-sort implementations,
  * Spark's included, use the same bit transform.)
  */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sortable_bits expects DOUBLE, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sortable_bits"

  override protected def nullSafeEval(v: Any): Any = {
    val s = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    if (s < 0) ~s else s | Long.MinValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"""((java.lang.Double.doubleToLongBits($v) < 0L)
         | ? ~java.lang.Double.doubleToLongBits($v)
         | : (java.lang.Double.doubleToLongBits($v) | java.lang.Long.MIN_VALUE))"""
        .stripMargin.replaceAll("\n", " "))

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)
}
