package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway timing harness (not a spec).
  * Run: sbt "Test/runMain graft.ops.PerfScratch [dataDir]" (default sf0.1).
  *
  * Round 12 shape: the simsearch_pq layout forensic (SOAK_r11 §3b /
  * VERDICT r11 ask #1). The driver's sf0.1 embeddings.parquet is ONE file
  * with ONE row group (2 000 rows) ⇒ the subvector explode + checkpoint
  * stage runs as a single task regardless of local[N]. This A/Bs the
  * identical query against the fixture dir and against a copy whose
  * embeddings are repartitioned 16-ways, isolating layout from code. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    // Copy the corpus with a 16-way repartitioned embeddings table; other
    // tables symlink-free (re-written single-part is fine — only
    // embeddings feeds the query under test).
    // self-cleaning scratch (deleted on JVM exit) — a plain temp dir
    // leaked a corpus-sized copy per run (ADVICE r12)
    val alt = Util.processTempRoot("pq-layout").getAbsolutePath
    spark.read.parquet(s"$dir/embeddings.parquet").repartition(16)
      .write.mode("overwrite").parquet(s"$alt/embeddings.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001").count()
    Vector.simsearchTopk(spark, "/root/testdata/sf0.001").count() // warm family codegen

    for (round <- 1 to 8) {
      println(s"--- round $round")
      time("pq fixture-layout") { Vector.simsearchPq(spark, dir).count() }
      if (round <= 2) {
        time("pq repartitioned") { Vector.simsearchPq(spark, alt).count() }
        time("pq train only") { Vector.pqTrainProbe(spark, dir) }
      }
    }
    spark.stop()
  }
}
