package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway timing harness (not a spec).
  * Run: sbt "Test/runMain graft.ops.PerfScratch [dataDir]" (default sf0.1). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001").count()

    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("ngramJaccard") { Text.dedupNgramJaccard(spark, dir).count() }
      time("shingleContainment") { Text.shingleContainment(spark, dir).count() }
      time("ccGroups") { Dedup.ccGroups(spark, dir).count() }
      time("minhashLsh") { Dedup.minhashLsh(spark, dir).count() }
    }
    spark.stop()
  }
}
