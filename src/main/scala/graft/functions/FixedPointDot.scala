package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `graft_dot(a, b)` — exact fixed-point dot product of two float arrays:
  * Σ floor(aᵢ·1e8) · floor(bᵢ·1e8), as a long in 1e-16 units.
  *
  * This is the hot kernel of every similarity operator (X5-X7). The
  * declarative form — `aggregate(zip_with(...))` — is evaluated as
  * interpreted lambda expressions per element and breaks whole-stage
  * codegen at the pair-scoring join. As a native Catalyst expression with
  * `doGenCode`, the 64-element loop compiles into the generated join code:
  * no per-element virtual calls, no lambda allocation, same generated code
  * on every executor of a 1000-node cluster.
  *
  * Numerics are identical to the declarative version (and the DuckDB
  * oracle): float→double widening, multiply by 1e8, floor, exact integer
  * multiply-accumulate — order-independent and overflow-free for |x| < 90
  * at 64 dims (|q| < 9e9 ⇒ |Σ| < 64·8.1e19... for unit-scale embeddings
  * |q| < 2e8 ⇒ |Σ| < 2.6e18 < 2^63).
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot"

  // A NULL element anywhere nulls the whole result — identical to the
  // declarative aggregate(zip_with(...)) form, where a null product
  // propagates through the sum. So does a LENGTH MISMATCH: zip_with
  // null-pads the shorter array, so the declarative form returns NULL,
  // never a partial dot over the common prefix. (Parquet float arrays
  // are schema-nullable even when no element is ever null, so rejecting
  // containsNull=true at analysis time would break every real read.)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val qa = math.floor(x.getFloat(i).toDouble * 1e8).toLong
      val qb = math.floor(y.getFloat(i).toDouble * 1e8).toLong
      sum += qa * qb
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |int $n = $a.numElements();
         |long ${ev.value}_acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $qa = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 1.0E8);
         |  long $qb = (long) java.lang.Math.floor(((double) $b.getFloat($i)) * 1.0E8);
         |  ${ev.value}_acc += $qa * $qb;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}
