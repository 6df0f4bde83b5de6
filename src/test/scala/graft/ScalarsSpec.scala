package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scalars

/** Value-level checks for the array-manipulation family — a fixture with
  * hand-computable contents pins every output column, where the DuckDB
  * oracle only proves cross-engine agreement. */
class ScalarsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("array ops: min/max/sorted-access/filter/slice/reverse on a known vector") {
    // embedding(i) = i - 32 for i = 1..64 → values -31 .. 32.
    val v = (1 to 64).map(i => (i - 32).toFloat).toArray
    val dir = fixtureDir("embeddings" -> Seq(EmbRow(7L, v, 0)).toDF)
    val r = Scalars.arrayOps(spark, dir).collect()(0)
    assert(r.getAs[Long]("vec_id") == 7L)
    assert(r.getAs[Double]("arr_min") == -31.0)
    assert(r.getAs[Double]("arr_max") == 32.0)
    // ascending sort leaves position i holding value i - 32 → 32nd is 0
    assert(r.getAs[Double]("sorted_32") == 0.0)
    assert(r.getAs[Long]("n_pos") == 32L) // values 1..32
    // first 8 elements: (1-32) + … + (8-32) = 36 - 256 = -220
    assert(r.getAs[Double]("head8_sum") == -220.0)
    assert(r.getAs[Double]("last_val") == 32.0)
  }
}
