package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable sorted-distinct min-k buffer: a plain `long[]` kept sorted
  * ascending, grown geometrically up to `k`. One heap object per group,
  * mutated in place across updates — the whole point of the
  * TypedImperativeAggregate rewrite (see [[MinKLongsAgg]]). */
final class MinKBuffer(val k: Int) {
  var xs: Array[Long] = new Array[Long](math.min(k, 8))
  var n: Int = 0

  /** Binary search over xs[0, n): insertion point (first index with
    * xs(i) >= x), or -(pos+1)-style is avoided — returns (found, pos). */
  private def searchPos(x: Long): Int = {
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  def insert(x: Long): Unit = {
    if (n >= k && x >= xs(n - 1)) return   // can't enter the min-k set
    val i = searchPos(x)
    if (i < n && xs(i) == x) return        // set semantics: collect once
    if (n < k && n == xs.length) {         // grow: ×2, capped at k
      val grown = new Array[Long](math.min(k, math.max(8, xs.length * 2)))
      System.arraycopy(xs, 0, grown, 0, n)
      xs = grown
    }
    val last = math.min(n, k - 1)          // slot that the shift fills up to
    System.arraycopy(xs, i, xs, i + 1, last - i)
    xs(i) = x
    if (n < k) n += 1
  }

  def mergeIn(o: MinKBuffer): Unit = {
    // Other side is small (≤ k ids); element-wise insertion keeps the
    // in-place discipline and is O(|o| · log n + shifts), plenty for k ≤ 256.
    var j = 0
    while (j < o.n) { insert(o.xs(j)); j += 1 }
  }
}

/** Native bounded "k smallest distinct longs" aggregate — the
  * TypedImperativeAggregate twin of [[graft.ops.Udaf.MinKLongs]], with
  * IDENTICAL semantics (distinct, sorted ascending, lowest k kept; callers
  * use k = cap for deterministic truncation, k = cap+1 for
  * drop-if-overflow — see the UDAF's doc for why the bound matters at
  * 100 TB: aggregation state stays ≤ k longs per group regardless of true
  * bucket size, and merge is associative+commutative so map-side partials
  * compose and the result is partitioning-independent).
  *
  * Why a second implementation: the `udaf(Aggregator)` path pays an
  * encoder round-trip (Seq[Long] ⇄ UnsafeArrayData) plus an immutable
  * Vector rebuild PER INPUT ROW — measured at 2.6 s for a 260 k-row
  * aggregation (sf0.1 shingle table), the dominant cost of the
  * n-gram-shingle family's r8 regression. This class keeps ONE mutable
  * `long[]` per group, mutated in place (binary search + arraycopy per
  * row), serialized only at shuffle/spill boundaries; it plans through
  * ObjectHashAggregateExec. Bit-equality with the UDAF spelling is
  * property-tested in UdafSpec (same distinct-sort-take(k) model, any
  * partitioning), and every declared query that swapped onto this
  * aggregate is still gated by its unchanged DuckDB oracle.
  *
  * Null inputs are skipped (the UDAF's Long input never saw nulls; all
  * call sites aggregate non-null id columns). */
case class MinKLongsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_longs"

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MinKBuffer): Any = {
    val out = new Array[Long](buf.n)
    System.arraycopy(buf.xs, 0, out, 0, buf.n)
    new GenericArrayData(out)
  }

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.xs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKBuffer(k)
    buf.xs = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { buf.xs(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKLongsAgg =
    copy(child = newChild)
}

object MinKLongsAgg {
  /** Column-API entry point: `minKLongs(col, k)` — sorted ascending array
    * of the k smallest distinct values of `c` per group. */
  def minKLongs(c: Column, k: Int): Column =
    Bridge.column(MinKLongsAgg(Bridge.expression(c), k).toAggregateExpression())
}
