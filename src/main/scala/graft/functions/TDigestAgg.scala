package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable t-digest state: sorted centroid arrays plus an unsorted
  * staging buffer of raw points, compressed in place when full — one
  * heap object per group, the [[MinKBuffer]] discipline. The merge rule
  * is Dunning's MERGING digest: concatenate, sort by mean, then one
  * greedy pass that grows a cluster while its weight stays under the
  * k0-style limit 4·W·q(1−q)/δ at the cluster's prospective mid-quantile
  * q — tight clusters at the tails (q(1−q)→0 forces singletons), coarse
  * in the middle, which is what bounds the RANK error by ~2/δ. */
final class TDigestBuf(val compression: Double) {
  var means: Array[Double] = new Array[Double](0)
  var weights: Array[Long] = new Array[Long](0)
  var nc: Int = 0
  var pts: Array[Double] = new Array[Double](64)
  var np: Int = 0
  var total: Long = 0L

  def add(x: Double): Unit = {
    if (np == pts.length) {
      if (np < 1024) {
        val grown = new Array[Double](np * 2)
        System.arraycopy(pts, 0, grown, 0, np)
        pts = grown
      } else compress()
    }
    pts(np) = x; np += 1; total += 1L
  }

  def mergeIn(o: TDigestBuf): Unit = {
    // rare (shuffle boundaries): materialize both sides and recompress
    val ms = new Array[Double](nc + o.nc + np + o.np)
    val ws = new Array[Long](ms.length)
    var k = 0
    var i = 0
    while (i < nc) { ms(k) = means(i); ws(k) = weights(i); i += 1; k += 1 }
    i = 0
    while (i < o.nc) { ms(k) = o.means(i); ws(k) = o.weights(i); i += 1; k += 1 }
    i = 0
    while (i < np) { ms(k) = pts(i); ws(k) = 1L; i += 1; k += 1 }
    i = 0
    while (i < o.np) { ms(k) = o.pts(i); ws(k) = 1L; i += 1; k += 1 }
    total += o.total
    np = 0
    compressInto(ms, ws, k)
  }

  def compress(): Unit = {
    if (np == 0) return
    val ms = new Array[Double](nc + np)
    val ws = new Array[Long](ms.length)
    var k = 0
    var i = 0
    while (i < nc) { ms(k) = means(i); ws(k) = weights(i); i += 1; k += 1 }
    i = 0
    while (i < np) { ms(k) = pts(i); ws(k) = 1L; i += 1; k += 1 }
    np = 0
    compressInto(ms, ws, k)
  }

  private def compressInto(ms: Array[Double], ws: Array[Long], k: Int): Unit = {
    // sort pairs by mean (insertion via index sort keeps weights aligned)
    val idx = (0 until k).sortBy(ms(_)).toArray
    val w = ws.take(k).sum.toDouble
    val om = new Array[Double](k)
    val ow = new Array[Long](k)
    var on = 0
    var curM = 0.0
    var curW = 0L
    var cum = 0L // weight fully emitted so far
    var j = 0
    while (j < k) {
      val m = ms(idx(j)); val wt = ws(idx(j))
      if (curW == 0L) { curM = m; curW = wt }
      else {
        val proposed = curW + wt
        val q = (cum + proposed / 2.0) / w
        val lim = math.max(1.0, 4.0 * w * q * (1.0 - q) / compression)
        if (proposed <= lim) {
          curM += (wt.toDouble / proposed.toDouble) * (m - curM)
          curW = proposed
        } else {
          om(on) = curM; ow(on) = curW; on += 1
          cum += curW
          curM = m; curW = wt
        }
      }
      j += 1
    }
    if (curW > 0L) { om(on) = curM; ow(on) = curW; on += 1 }
    means = java.util.Arrays.copyOf(om, on)
    weights = java.util.Arrays.copyOf(ow, on)
    nc = on
  }

  /** Quantile estimate by linear interpolation between centroid
    * mid-weights — the standard t-digest serve path. */
  def quantile(q: Double): Double = {
    compress()
    if (nc == 0) return Double.NaN
    if (nc == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < nc) {
      val mid = cum + weights(i) / 2.0
      if (target < mid) {
        if (i == 0) return means(0)
        val pm = cum - weights(i - 1) / 2.0
        val f = (target - pm) / (mid - pm)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(nc - 1)
  }
}

/** Native t-digest quantile-sketch aggregate — the MERGEABLE quantile
  * summary next to the engine's HLL/CMS/KMV sketches: every executor
  * digests its split into O(δ) centroids, partials merge associatively
  * at shuffle boundaries, and the driver-side result is KBs regardless
  * of input size — the only way rank statistics scale to 100 TB without
  * a global sort. Rank error is bounded (~2/δ; δ=100 ⇒ well under a
  * 0.02 rank tolerance), but the exact estimate depends on partition
  * order — so declared queries gate it with the [[graft.ops.Relational
  * .aggApproxDistinct]] FLAG pattern: emit the exact quantile plus a
  * Spark-verified rank-error bound the oracle pins TRUE, never the raw
  * estimate. Plans through ObjectHashAggregateExec like [[MinKLongsAgg]].
  * Null inputs are skipped. */
case class TDigestAgg(
    child: Expression,
    compression: Double,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(compression >= 10.0, s"compression too small: $compression")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs: $qs")

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "tdigest_quantiles"

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buf: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TDigestBuf, other: TDigestBuf): TDigestBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TDigestBuf): Any =
    new GenericArrayData(qs.map(buf.quantile).toArray)

  override def serialize(buf: TDigestBuf): Array[Byte] = {
    buf.compress()
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + buf.nc * 16)
    bb.putInt(buf.nc)
    bb.putLong(buf.total)
    var i = 0
    while (i < buf.nc) { bb.putDouble(buf.means(i)); bb.putLong(buf.weights(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TDigestBuf(compression)
    buf.total = bb.getLong
    buf.means = new Array[Double](n)
    buf.weights = new Array[Long](n)
    var i = 0
    while (i < n) { buf.means(i) = bb.getDouble; buf.weights(i) = bb.getLong; i += 1 }
    buf.nc = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
}

object TDigestAgg {
  /** Column-API entry point: per-group array of quantile estimates at
    * `qs` from a δ=`compression` t-digest over `c`. */
  def tdigestQuantiles(c: Column, compression: Double, qs: Seq[Double]): Column =
    Bridge.column(TDigestAgg(Bridge.expression(c), compression, qs)
      .toAggregateExpression())
}
