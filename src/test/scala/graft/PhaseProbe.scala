package graft.ops

import org.apache.spark.sql.SparkSession

/** One-off planning-vs-execution phase probe (not a spec).
  * Run: sbt "Test/runMain graft.ops.PhaseProbe <query> [query...]" */
object PhaseProbe {
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
    args.foreach { name =>
      graft.SparkEntry.queries.get(name).foreach { fn =>
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val qe = df.queryExecution
          val t1 = System.nanoTime()
          qe.executedPlan // forces analysis + optimization + physical planning
          val t2 = System.nanoTime()
          qe.toRdd.count()
          val t3 = System.nanoTime()
          println(f"[phase] $name run$i build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f")
        }
      }
    }
    spark.stop()
  }
}
