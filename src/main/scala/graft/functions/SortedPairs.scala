package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native unordered-pair expansion of a bucket member list: for input
  * `[x0, x1, …, x(n-1)]` emit `[(x0,x1), (x0,x2), …, (x(n-2),x(n-1))]`
  * — every (i, j) with i < j, first element first, EXACTLY the order and
  * contents of the SQL lambda it replaces:
  *
  * {{{ flatten(transform(ds, (x, i) ->
  *       transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2)))) }}}
  *
  * Why native: the lambda spelling evaluates interpreted higher-order
  * functions and allocates a struct + two array slices per pair on the
  * hottest path of the candidate-pair family (measured: 2.2 s to expand
  * 1.27 M pairs at sf0.1 — more than the shuffle that follows). One fused
  * eval builds the full pair array with two int cursors. Callers pass
  * capped bucket lists ([[graft.ops.Dedup.LshBucketCap]] /
  * `Text.NgramDfCap`), so the output is bounded at cap²/2 pairs.
  *
  * CodegenFallback: sits directly under a Generate (explode), which is
  * already a whole-stage-codegen boundary. */
case class SortedPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sorted_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = arr.toLongArray()
    val out = new Array[Any](n * (n - 1) / 2)
    var p = 0
    var i = 0
    while (i < n - 1) {
      val x = xs(i)
      var j = i + 1
      while (j < n) {
        out(p) = new GenericInternalRow(Array[Any](x, xs(j)))
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  /** Column-API entry point: array<long> → array<struct<d1,d2>> of all
    * i<j pairs in input order. */
  def pairs(c: Column): Column = Bridge.column(SortedPairs(Bridge.expression(c)))
}
