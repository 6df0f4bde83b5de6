package graft.ops

import org.apache.spark.sql.SparkSession

/** Whole-suite plan-shape audit (not a spec): per declared query, counts
  * of parquet scans, exchanges, generates, and join strategies in the
  * pre-AQE physical plan — no execution. Flags multi-scan queries.
  * Run: sbt "Test/runMain graft.ops.ShapeAudit" */
object ShapeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.sparkPlan
        var scans, ex, gen, smj, bhj, win = 0
        p.foreach {
          case _: org.apache.spark.sql.execution.FileSourceScanExec => scans += 1
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ex += 1
          case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => ()
          case _: org.apache.spark.sql.execution.GenerateExec => gen += 1
          case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj += 1
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => bhj += 1
          case _: org.apache.spark.sql.execution.window.WindowExec => win += 1
          case _ => ()
        }
        println(s"[shape] $name scans=$scans ex=$ex gen=$gen smj=$smj bhj=$bhj win=$win")
      } catch { case t: Throwable =>
        println(s"[shape] $name ERROR ${t.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
