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
    val iters = sys.env.getOrElse("SPARK_GRAFT_PHASE_ITERS", "3").toInt
    val names =
      if (args.sameElements(Array("ALL"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    names.foreach { name =>
      graft.SparkEntry.queries.get(name).foreach { fn =>
        val runs = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val qe = df.queryExecution
          val t1 = System.nanoTime()
          try qe.executedPlan // analysis + optimization + physical planning
          catch { case _: Throwable => () }
          val t2 = System.nanoTime()
          try qe.toRdd.count() catch { case _: Throwable => () }
          val t3 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        }
        val best = runs.minBy(r => r._1 + r._2 + r._3)
        println(f"[phase] $name%-32s build=${best._1}%6.3f plan=${best._2}%6.3f exec=${best._3}%6.3f")
      }
    }
    spark.stop()
  }
}
