package graft

import org.apache.spark.sql.SparkSession

/** Throwaway timing harness for the near-dup family (not a spec).
  * Run: sbt "Test/runMain graft.PerfScratch"
  */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    graft.ops.Relational.aggPricingSummary(spark, "/root/testdata/sf0.001").count()

    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("dedup_minhash_shingle") { graft.ops.Dedup.minhashShingle(spark, dir).count() }
      time("dedup_minhash_lsh") { graft.ops.Dedup.minhashLsh(spark, dir).count() }
      time("dedup_ngram_jaccard") { graft.ops.Text.dedupNgramJaccard(spark, dir).count() }
      time("text_tfidf") { graft.ops.Text.tfidf(spark, dir).count() }
    }
    spark.stop()
  }
}
