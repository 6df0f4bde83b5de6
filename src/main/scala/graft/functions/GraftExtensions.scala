package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers graft's native expressions in the
  * SQL function registry, so `spark.sql("SELECT dot_product_float(a, b)")`
  * plans the same codegen'd expression the DataFrame API uses.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (Spark instantiates this class reflectively on session build).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
      GraftExtensions.dotBuilder))
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private[functions] val dotBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2,
      s"dot_product_float expects 2 arguments, got ${args.length}")
    DotProductFloat(args.head, args(1))
  }

  /** Register on an already-built session (builder-time extensions can't
    * reach it): same builder, same registry entry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "dot_product_float", classOf[DotProductFloat].getName, dotBuilder)
}
