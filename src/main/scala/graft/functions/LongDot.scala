package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_dot_long(a, b)` — exact integer dot product of two long
  * arrays: Σ aᵢ·bᵢ.
  *
  * The integer-weight sibling of [[FixedPointDot]] (which fixed-point
  * scales FLOAT embeddings by 1e8 — unusable for tf·idf weights, where
  * the scaled products overflow a long). Exists for the same reason:
  * the declarative `aggregate(zip_with(...))` form evaluates interpreted
  * lambdas per element and breaks whole-stage codegen at the pair-scoring
  * stage — x67's brute mining ran 5× slower on the lambda form.
  * Overflow-free for |aᵢ·bᵢ|·dims < 2^63 (tf·idf weights are ≤ ~2^14,
  * giving ~2^34 of headroom at 64 dims).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot_long"

  // NULL element ⇒ NULL result, matching aggregate(zip_with(...)); so
  // does a LENGTH MISMATCH — zip_with null-pads the shorter array and
  // the null products null the sum. Arrays here are fixed 64-dim, so a
  // mismatch is always a caller bug; NULL surfaces it instead of
  // silently truncating to a partial dot product.
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
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |long ${ev.value}_acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  ${ev.value}_acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}
