package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks the two assumptions CmsEstimateLong makes about Spark's
  * count_min_sketch: the V1 stream layout parseV1 reads, and the
  * per-row hash (a·x mod 2^31−1 with the `>> 32` fold). Both are
  * verified against the REAL impl — the sketch built by the SQL
  * aggregate, estimates compared to CountMinSketch.estimateCount —
  * across positive, negative, boundary, and unseen keys, distributed
  * through the actual expression (codegen path) not just eval. */
class CmsEstimateSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val keys: Seq[Long] = {
    val r = new scala.util.Random(7)
    // skewed multiset: heavy keys, singletons, negatives, Long extremes
    Seq.fill(400)(r.nextInt(5).toLong) ++
      Seq.fill(300)(r.nextLong()) ++
      Seq(Long.MaxValue, Long.MinValue, -1L, 0L, 42L, 42L, 42L)
  }

  test("expression estimates match CountMinSketch.estimateCount for every key (seen and unseen)") {
    val df = keys.toDF("k")
    val skBytes = df.select(expr("count_min_sketch(k, 0.01d, 0.95d, 17)").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))

    val probes = (keys.distinct ++ Seq(999999999L, -999999999L, 7L)).distinct
    val (estCol, totalCount) =
      graft.functions.CmsEstimateLong.fromSketchBytes(col("k"), skBytes)
    assert(totalCount == cms.totalCount(), "parsed totalCount disagrees with impl")

    val got = probes.toDF("k").repartition(3)
      .select(col("k"), estCol.as("e")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { k =>
      val want = cms.estimateCount(k.asInstanceOf[Any])
      assert(got(k) == want, s"estimate mismatch for key $k: got ${got(k)}, impl says $want")
    }
  }

  test("null key yields null estimate; exact multiset counts are never under-estimated") {
    val df = keys.toDF("k")
    val skBytes = df.select(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val (estCol, _) =
      graft.functions.CmsEstimateLong.fromSketchBytes(col("k"), skBytes)

    val nullRow = Seq[Option[Long]](None).toDF("k").select(estCol.as("e")).collect()(0)
    assert(nullRow.isNullAt(0), "null key should estimate to null")

    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = keys.distinct.toDF("k").select(col("k"), estCol.as("e")).collect()
    got.foreach { r =>
      assert(r.getLong(1) >= exact(r.getLong(0)),
        s"CMS under-estimated key ${r.getLong(0)}")
    }
  }

  test("parseV1 rejects a non-V1 stream loudly") {
    val bogus = java.nio.ByteBuffer.allocate(24).putInt(2).array()
    val e = intercept[IllegalArgumentException] {
      graft.functions.CmsEstimateLong.parseV1(bogus)
    }
    assert(e.getMessage.contains("version"))
  }
}
