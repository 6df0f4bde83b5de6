package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression serving count–min-sketch point estimates
  * for LONG keys — the engine-native respelling of the last per-row
  * Scala UDF this engine carried (`agg_countmin_heavy`'s
  * `udf(u => cms.estimateCount(u))`): the sketch counters ride the
  * expression tree as plain `long[]` reference objects (KBs — CMS is
  * small by construction, that's its whole point), and each row takes
  * `min_d table[d][hash_d(key)]` inside whole-stage codegen.
  *
  * The hash is bit-identical to Spark's own
  * `org.apache.spark.util.sketch.CountMinSketchImpl.hash(long,int)`
  * (verified against the 4.1.2 bytecode and property-tested against
  * `estimateCount` in CmsEstimateLongSpec):
  * `h = hashA[d]*item; h += h >> 32; h &= (2^31-1); bucket = (int)h % width`
  * — the classic (a·x mod 2^31−1) universal hash; the masked value is
  * non-negative so `%` never needs a sign fix.
  *
  * [[CmsEstimateLong.fromSketchBytes]] builds the expression straight
  * from a serialized sketch (the `count_min_sketch` aggregate's output),
  * parsing the public V1 stream layout
  * `[int version=1, long totalCount, int depth, int width,
  *   long hashA[depth], long table[depth][width] row-major]`
  * — no reflection into the impl, and a layout change would fail loudly
  * on the version check.
  *
  * Nulls: null key → null (standard null-intolerant unary semantics).
  */
case class CmsEstimateLong(
    child: Expression,
    hashA: Seq[Long],
    flatTable: Seq[Long],
    width: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(width > 0 && hashA.nonEmpty && flatTable.size == hashA.size * width,
    s"inconsistent CMS geometry: depth=${hashA.size} width=$width table=${flatTable.size}")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate_long"

  @transient private lazy val hA: Array[Long] = hashA.toArray
  @transient private lazy val tb: Array[Long] = flatTable.toArray

  override def nullSafeEval(input: Any): Any = {
    val item = input.asInstanceOf[Long]
    var res = Long.MaxValue
    var d = 0
    while (d < hA.length) {
      var h = hA(d) * item
      h += h >> 32
      h &= 2147483647L
      res = math.min(res, tb(d * width + h.toInt % width))
      d += 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hRef = ctx.addReferenceObj("cmsHashA", hA, "long[]")
    val tRef = ctx.addReferenceObj("cmsTable", tb, "long[]")
    nullSafeCodeGen(ctx, ev, item => {
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val res = ctx.freshName("res")
      s"""
         |long $res = Long.MAX_VALUE;
         |for (int $d = 0; $d < $hRef.length; $d++) {
         |  long $h = $hRef[$d] * $item;
         |  $h += $h >> 32;
         |  $h &= 2147483647L;
         |  $res = Math.min($res, $tRef[$d * $width + ((int) $h) % $width]);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateLong =
    copy(child = newChild)
}

object CmsEstimateLong {

  /** Parsed V1 sketch: (totalCount, depth, width, hashA, flat row-major table). */
  private[graft] def parseV1(bytes: Array[Byte]): (Long, Int, Int, Array[Long], Array[Long]) = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1, s"unsupported count_min_sketch stream version $version")
    val totalCount = in.readLong()
    val depth = in.readInt()
    val width = in.readInt()
    val hashA = Array.fill(depth)(in.readLong())
    val flat = Array.fill(depth * width)(in.readLong())
    (totalCount, depth, width, hashA, flat)
  }

  /** Column-API entry point from a serialized sketch (the bytes the
    * `count_min_sketch` SQL aggregate returns). Also hands back the
    * sketch's totalCount — callers need it for the εN error bound and
    * it rides the same stream header. */
  def fromSketchBytes(key: Column, sketchBytes: Array[Byte]): (Column, Long) = {
    val (totalCount, _, width, hashA, flat) = parseV1(sketchBytes)
    (Bridge.column(CmsEstimateLong(
      Bridge.expression(key),
      hashA.toIndexedSeq, flat.toIndexedSeq, width)), totalCount)
  }
}
