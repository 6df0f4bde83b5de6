package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise sum of fixed-width `array<long>` rows — the native
  * vector-accumulator aggregate the Gram-matrix pass needs
  * ([[graft.ops.Vector.embeddingPcaPower]]): every input row carries a
  * d(d+1)/2-length array of quantized products, and the group state is
  * ONE mutable `long[]` mutated in place, so the corpus never explodes
  * into (key, value) rows at all. Compare the explode + groupBy(k)
  * spelling it replaced: 2080 struct rows PER INPUT ROW through a
  * generator, a hash-agg probe per cell, and a 2080-key shuffle —
  * measured 2.9 s vs ~0.5 s for the identical Gram at sf0.1. Merge is
  * element-wise addition (associative + commutative), so map-side
  * partials compose and the result is partitioning-independent; the
  * shuffle carries one `long[width]` blob per partition.
  *
  * Overflow contract: the CALLER bounds |element| · rows < 2^63 (the
  * Gram pass quantizes products to 1e6 integer units, |q| ≤ 1e6, so the
  * sum is exact to ~9e12 rows — far past the 100 TB design point).
  * Null rows are skipped; width is fixed by the first row seen and
  * asserted on every later row (a ragged input is a caller bug, not a
  * truncation). */
final class LongVecBuffer {
  var xs: Array[Long] = null
  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    if (xs == null) xs = new Array[Long](n)
    require(xs.length == n,
      s"LongVecSumAgg: ragged input (width ${xs.length} vs $n)")
    var i = 0
    while (i < n) { xs(i) += a.getLong(i); i += 1 }
  }
  def mergeIn(o: LongVecBuffer): Unit = {
    if (o.xs == null) return
    if (xs == null) { xs = o.xs.clone(); return }
    require(xs.length == o.xs.length,
      s"LongVecSumAgg: ragged merge (${xs.length} vs ${o.xs.length})")
    var i = 0
    while (i < xs.length) { xs(i) += o.xs(i); i += 1 }
  }
}

case class LongVecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVecBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "long_vec_sum"

  override def createAggregationBuffer(): LongVecBuffer = new LongVecBuffer

  override def update(buf: LongVecBuffer, input: InternalRow): LongVecBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: LongVecBuffer, other: LongVecBuffer): LongVecBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: LongVecBuffer): Any =
    if (buf.xs == null) null else new GenericArrayData(buf.xs.clone())

  override def serialize(buf: LongVecBuffer): Array[Byte] = {
    val n = if (buf.xs == null) 0 else buf.xs.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.xs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVecBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongVecBuffer
    if (n > 0) {
      buf.xs = new Array[Long](n)
      var i = 0
      while (i < n) { buf.xs(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVecSumAgg =
    copy(child = newChild)
}

object LongVecSumAgg {
  /** Column-API entry point: element-wise sum of `array<long>` rows. */
  def longVecSum(c: Column): Column =
    Bridge.column(LongVecSumAgg(Bridge.expression(c)).toAggregateExpression())
}
