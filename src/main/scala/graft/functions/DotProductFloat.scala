package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float vectors, accumulated
  * in doubles, sequentially in array order.
  *
  * This is the one hot loop of the similarity family (`graft.ops.Vector`):
  * the `zip_with`+`aggregate` higher-order formulation is semantically
  * identical but evaluates a lambda per element interpreted; this fused
  * loop lives inside whole-stage codegen. The accumulation order matches
  * the HOF version and the DuckDB oracle exactly (left-to-right over
  * doubles), so swapping it in changes no result bit.
  *
  * Nulls: a null array yields null (standard null-intolerant binary
  * semantics); elements are assumed non-null (embedding vectors). Unequal
  * lengths dot the common prefix.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (return type inferred: AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  /** Column-API entry point. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductFloat(Bridge.expression(a), Bridge.expression(b)))
}

/** Dot product of a float vector with a DOUBLE vector — the k-means hot
  * loop (trained centroids are double-valued means; the corpus stays
  * float). Same sequential left-to-right double accumulation as
  * [[DotProductFloat]] and the `zip_with`+`aggregate` HOF formulation it
  * replaces (measured ~3 s of interpreted lambda per bench run across the
  * 4 IVF assignment passes), so swapping it in changes no result bit. */
case class DotProductFloatDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloatDouble =
    copy(left = newLeft, right = newRight)
}

object DotProductFloatDouble {
  /** Column-API entry point. */
  def dotFD(a: Column, b: Column): Column =
    Bridge.column(DotProductFloatDouble(Bridge.expression(a), Bridge.expression(b)))
}
