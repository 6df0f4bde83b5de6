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
      time("ccGroups (current)") { Dedup.ccGroups(spark, dir).count() }
      time("ccGroups (instrumented)") { ccInstrumented(spark, dir).count() }
    }
    spark.stop()
  }

  private def ccInstrumented(spark: SparkSession, dir: String): DataFrame = {
    import Util.table
    val t00 = System.nanoTime()
    val base = table(spark, dir, "documents").select(
      col("doc_id"), col("source"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val pairs = Dedup.candidatePairs(base, "s")
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint()
    println(f"[perf]   edges checkpoint       ${(System.nanoTime() - t00) / 1e9}%6.2f s (${edges.count()} edges)")
    var t0 = System.nanoTime()
    var lbl = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id")).localCheckpoint()
    println(f"[perf]   init                   ${(System.nanoTime() - t0) / 1e9}%6.2f s (${lbl.count()} nodes)")
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 25) {
      t0 = System.nanoTime()
      val nbrMin = edges.join(lbl, edges("src") === lbl("doc_id"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nbl"))
      val next = lbl.join(nbrMin, lbl("doc_id") === nbrMin("dst"), "left")
        .select(lbl("doc_id"),
          least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"),
          (col("nbl") < col("lbl")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      lbl = next.select("doc_id", "lbl")
      rounds += 1
      println(f"[perf]   round $rounds%2d changed=$changed%-6d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val sz = lbl.groupBy(col("lbl").as("root")).agg(count(lit(1)).as("n_members"))
    lbl.select(col("doc_id"), col("lbl").as("root"))
      .join(sz, "root")
      .select(col("doc_id"), col("root"), col("n_members"))
      .orderBy("doc_id")
  }
}
