package graft.ops

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (not a spec).
  * Run: sbt "Test/runMain graft.ops.PlanDump <outDir> <query> [query...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PLAN_ITERS (default 3).
  *
  * For each named declared query: writes `<outDir>/<query>.txt` with the
  * formatted physical plan, and prints min/all timings forced the same way
  * Bench forces (queryExecution.toRdd.count()) so numbers line up with the
  * round artifacts. Timing is taken BEFORE the explain so codegen caches
  * warmed by the explain cannot flatter the first iteration.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PLAN_ITERS", "3").toInt
    val outDir = args.head
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same operator-family warmup as Bench so first-query numbers are sane
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try Relational.windowLagDelta(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    try Relational.joinInnerHash(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    try Text.tokenTopk(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    args.tail.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[plan] unknown query: $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"plandump: $name")
          // executed once so the AQE FINAL plan (with ReusedExchange /
          // runtime join strategy changes) is what gets dumped
          val finalDf = fn(spark, sfDir)
          try finalDf.queryExecution.toRdd.count()
          catch { case t: Throwable => println(s"[plan] $name FAILED: $t") }
          val times = (1 to iters).map { _ =>
            val t0 = System.nanoTime()
            try fn(spark, sfDir).queryExecution.toRdd.count()
            catch { case t: Throwable => println(s"[plan] $name FAILED: $t"); -1L }
            (System.nanoTime() - t0) / 1e9
          }
          val plan = finalDf.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/$name.txt")
          try w.println(plan) finally w.close()
          println(f"[plan] $name%-28s min=${times.min}%6.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
          spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
