package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FixedPointDot, LongDot, Md5U60, SortableDoubleBits}

/** Engine extension point: custom Catalyst expressions registered through
  * `SparkSessionExtensions` so they are first-class SQL functions —
  * usable from `spark.sql(...)`, `expr(...)`, and `call_function`, and
  * visible to Catalyst for codegen like any built-in.
  *
  * Install via `SparkSession.builder.withExtensions(GraftExtensions.inject)`
  * (GraftSession does this) or
  * `spark.sql.extensions=graft.GraftExtensions` in config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot requires exactly 2 arguments")
        FixedPointDot(args.head, args(1))
      }),
    (FunctionIdentifier("graft_md5u60"),
      new ExpressionInfo(classOf[Md5U60].getName, "graft_md5u60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5u60 requires exactly 1 argument")
        Md5U60(args.head)
      }),
    (FunctionIdentifier("graft_sortable_bits"),
      new ExpressionInfo(classOf[SortableDoubleBits].getName, "graft_sortable_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_sortable_bits requires exactly 1 argument")
        SortableDoubleBits(args.head)
      }),
    (FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot_long requires exactly 2 arguments")
        LongDot(args.head, args(1))
      }))

  def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    // AQE runtime rewrite: global sort over a runtime-small (exact-stats)
    // child -> single-partition local sort; identity on corpus-shaped
    // frames. See [[SmallSortRule]].
    ext.injectRuntimeOptimizerRule(SmallSortRule)
  }

  /** Late registration on an already-built session (e.g. a caller-supplied
    * SparkSession that was not created through GraftSession). Idempotent.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
