package graft.ops

import org.apache.spark.sql.SparkSession

/** Time individual declared queries by name (not a spec).
  * Run: sbt "Test/runMain graft.ops.QuickBench <query> [query...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4).
  * Each query runs twice; the second number is the warm one. */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[qb] unknown query: $name")
        case Some(fn) =>
          (1 to 2).foreach { i =>
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            println(f"[qb] $name run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
          }
      }
    }
    spark.stop()
  }
}
