package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared L2 distance between two double
  * vectors, accumulated sequentially in array order.
  *
  * The product-quantization hot loop (`graft.ops.Vector.simsearchPq`):
  * training assigns every (vector, subspace) to its nearest of 16
  * centroids, so this runs |corpus|·subspaces·centroids times per Lloyd
  * pass — as a `zip_with`+`aggregate` higher-order function each element
  * evaluates an interpreted lambda; this fused loop stays inside
  * whole-stage codegen. Per element it computes d = x−y then adds d·d,
  * exactly the HOF spelling's IEEE op order and the DuckDB oracle's
  * `list_sum(list_transform(...))`, so swapping it in changes no result
  * bit.
  *
  * Nulls: a null array yields null; elements are assumed non-null.
  * Unequal lengths fold the common prefix.
  */
case class SqDistDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDouble =
    copy(left = newLeft, right = newRight)
}

object SqDistDouble {
  /** Column-API entry point. */
  def sqDist(a: Column, b: Column): Column =
    Bridge.column(SqDistDouble(Bridge.expression(a), Bridge.expression(b)))
}
