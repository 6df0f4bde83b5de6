package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off cost attribution for scalar_try_safe (not a spec).
  * Run: sbt "Test/runMain graft.ops.TryProbe" */
object TryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[try] $label%-28s min=${times.min}%6.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val o = Util.table(spark, sfDir, "orders")
    t("full scalar_try_safe") { Scalars.trySafe(spark, sfDir) }
    t("scan+sort only") {
      o.select(col("o_orderkey")).orderBy("o_orderkey") }
    t("try_divide only") {
      o.select(col("o_orderkey"),
        Util.r4(expr("try_divide(o_totalprice, o_orderkey % 3)")).as("d"))
        .orderBy("o_orderkey") }
    t("try_cast status only") {
      o.select(col("o_orderkey"),
        expr("CAST(try_cast(o_orderstatus AS INT) AS BIGINT)").as("s"))
        .orderBy("o_orderkey") }
    t("try_cast prio only") {
      o.select(col("o_orderkey"),
        expr("CAST(try_cast(substr(o_orderpriority, 1, 1) AS INT) AS BIGINT)").as("p"))
        .orderBy("o_orderkey") }
    t("least/greatest only") {
      o.select(col("o_orderkey"),
        least(col("o_totalprice"), lit(100000.0)).as("lo"),
        greatest(col("o_totalprice"), lit(100000.0)).as("hi"))
        .orderBy("o_orderkey") }
    t("when-guarded divide") {
      o.select(col("o_orderkey"),
        Util.r4(expr(
          "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice / (o_orderkey % 3) END")).as("d"))
        .orderBy("o_orderkey") }
    spark.stop()
  }
}
