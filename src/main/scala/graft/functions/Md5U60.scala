package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5u60(s)` — 60-bit portable string hash: the lower 8 bytes of
  * md5 in little-endian order (DuckDB's `md5_number_lower`), shifted right
  * 4 bits to fit a signed long.
  *
  * Numerically identical to `CrossHash.md5u60` (hex-substring `conv`
  * composition) but evaluated as one digest call on the raw UTF-8 bytes —
  * no hex-string materialization, no 8 substrings + concat + conv per row.
  * This is the per-token/per-shingle hot path of the MinHash and SimHash
  * operators (millions of rows per partition at corpus scale).
  */
case class Md5U60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_md5u60 expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5u60"

  override protected def nullSafeEval(s: Any): Any =
    Md5U60.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5U60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5U60 =
    copy(child = newChild)
}

object Md5U60 {

  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Little-endian uint64 of md5 bytes 8..15, logically shifted right 4. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v |= (d(8 + i) & 0xffL) << (8 * i)
      i += 1
    }
    v >>> 4
  }
}
