package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge step: one left-to-right non-overlapping pass of the
  * winning pair (t1, t2) over a document's token array, returning the
  * merged array plus the number of merges performed.
  *
  * The merge is the inherently SEQUENTIAL part of BPE training — exactly
  * the semantics the relational formulation in `graft.ops.Text.bpeMerge`'s
  * oracle spells out with candidate-run detection and an offset-parity
  * test over a (doc, pos) window sort. Sequential per-document state
  * belongs in a per-row fused loop, not a shuffle: evaluating this
  * expression over the per-doc token array removes BOTH full
  * shuffle+sorts the window formulation pays per training round (one to
  * count pairs with lead(), one to mark/merge/renumber), which is what
  * dominated `text_bpe_train` (8 rounds × 2 corpus sorts). Pair counting
  * stays declarative (zip_with adjacency explode + hash agg); only the
  * scan-order merge lives here.
  *
  * Bit-identical to the parity formulation by construction: a candidate
  * at position p merges iff no merge consumed p — the definition the
  * run-parity test encodes — and both emit `t1_t2` for merged tokens.
  * The chained-CTE oracle (which replays the parity spelling in SQL)
  * gates every round of the swap.
  *
  * CodegenFallback: the input side sits at the checkpoint scan boundary
  * and the output feeds a Generate (explode) or a projection — segments
  * whole-stage codegen already splits; the fused JVM loop removes the
  * per-element lambda interpretation that an `aggregate` HOF spelling
  * would pay (and the HOF's O(n²) array-append besides).
  *
  * Nulls: a null token array yields null; null ELEMENTS never match a
  * pair and pass through unchanged (split() never produces them).
  */
case class BpeMergeOnce(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = true), nullable = false),
    StructField("nm", LongType, nullable = false)))
  override def prettyName: String = "bpe_merge_once"

  override def nullSafeEval(toksAny: Any, t1Any: Any, t2Any: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val t1 = t1Any.asInstanceOf[UTF8String]
    val t2 = t2Any.asInstanceOf[UTF8String]
    val merged = UTF8String.concat(t1, BpeMergeOnce.underscore, t2)
    val n = toks.numElements()
    val out = new java.util.ArrayList[Any](n)
    var nm = 0L
    var i = 0
    while (i < n) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (cur != null && i + 1 < n && !toks.isNullAt(i + 1) &&
          cur.equals(t1) && toks.getUTF8String(i + 1).equals(t2)) {
        out.add(merged.clone())
        nm += 1L
        i += 2
      } else {
        out.add(if (cur == null) null else cur.clone())
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(out.toArray), nm)): InternalRow
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMergeOnce =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergeOnce {
  private[functions] val underscore: UTF8String = UTF8String.fromString("_")

  /** Column-API entry point: returns struct(toks: merged token array,
    * nm: number of merges performed). */
  def mergeOnce(toks: Column, t1: Column, t2: Column): Column =
    Bridge.column(BpeMergeOnce(
      Bridge.expression(toks), Bridge.expression(t1), Bridge.expression(t2)))
}
