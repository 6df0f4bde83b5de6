package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK

/** The custom TopKPerKey operator must be row-for-row equivalent to the
  * row_number window formulation — checked on real data and edge cases. */
class TopKSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("equals the window row_number formulation on real orders") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val expected = windowTopK(orders, 3).collect().map(_.toSeq).toSet
    val got = TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(TopK.Ord("o_totalprice", descending = true), TopK.Ord("o_orderkey")), 3)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("propagates child partitioning: same-key consumer adds no second exchange") {
    // TopKPerKeyExec forces ONE hashpartitioning(keys) exchange below it;
    // a groupBy on the same key must reuse that layout. Without the
    // outputPartitioning override the exec reports Unknown and the agg
    // re-shuffles 5 rows that are already exactly placed — at 100 TB
    // that phantom exchange is a full dataset pass.
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val top = TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(TopK.Ord("o_totalprice", descending = true), TopK.Ord("o_orderkey")), 3)
    val agg = top.groupBy("o_custkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1,
      s"expected exactly one hash exchange (below the heap exec), got $nExchanges:\n$plan")
    assert(agg.count() > 0)
  }

  test("k larger than every group returns all rows") {
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val got = TopK.topKPerKey(df, Seq("k"), Seq(TopK.Ord("v", descending = true)), 100)
      .collect().map(_.toSeq).toSet
    assert(got == df.collect().map(_.toSeq).toSet)
  }

  test("ties resolved by the full sort order, bounded at k rows per key") {
    val df = Seq((1L, 10.0, "a"), (1L, 10.0, "b"), (1L, 10.0, "c"), (2L, 1.0, "z"))
      .toDF("k", "v", "t")
    val got = TopK.topKPerKey(df, Seq("k"),
      Seq(TopK.Ord("v", descending = true), TopK.Ord("t")), 2)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == Set((1L, "a"), (1L, "b"), (2L, "z")))
  }

  test("physical plan uses TopKPerKeyExec with a single hash shuffle, no sort") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val df = TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(TopK.Ord("o_totalprice", descending = true), TopK.Ord("o_orderkey")), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom exec not planned:\n$p")
    assert(!p.toLowerCase.contains("sortexec") && !p.contains("Window"),
      s"fell back to sort/window:\n$p")
  }
}
