package graft

import org.apache.spark.sql.functions._

/** Scratch stage profiler for the n-gram shingle family (run manually:
  * `sbt "Test/runMain graft.ProfileNgram"`) — times each stage of
  * shinglePairCountsKeyed in isolation to localize regressions. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label%-28s iter$i rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    time("scan+shingle explode") {
      docs.select(col("doc_id"), col("source"),
        explode(graft.ops.Util.shingle3(col("text"))).as("s")).count()
    }
    time("buckets agg (native minK)") {
      docs.select(col("doc_id"), col("source"),
          explode(graft.ops.Util.shingle3(col("text"))).as("s"))
        .groupBy("source", "s")
        .agg(graft.functions.MinKLongsAgg.minKLongs(col("doc_id"), 65).as("ds"))
        .filter(size(col("ds")) <= 64)
        .count()
    }
    val buckets = docs.select(col("doc_id"), col("source"),
        explode(graft.ops.Util.shingle3(col("text"))).as("s"))
      .groupBy("source", "s")
      .agg(graft.functions.MinKLongsAgg.minKLongs(col("doc_id"), 65).as("ds"))
      .filter(size(col("ds")) <= 64)
      .cache()
    buckets.count()
    time("cnt (explode+count)") {
      buckets.select(explode(col("ds")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n")).count()
    }
    time("pairs (SortedPairs+agg)") {
      buckets.filter(size(col("ds")) >= 2)
        .select(col("source"),
          explode(graft.functions.SortedPairs.pairs(col("ds"))).as("p"))
        .select(col("source"), col("p.d1").as("d1"), col("p.d2").as("d2"))
        .groupBy("source", "d1", "d2").agg(count(lit(1)).as("inter"))
        .count()
    }
    buckets.unpersist()
    time("full dedupNgramJaccard") {
      graft.ops.Text.queries("dedup_ngram_jaccard")(spark, dir).count()
    }
    time("full shingle_containment") {
      graft.ops.Text.queries("text_shingle_containment")(spark, dir).count()
    }
    spark.stop()
  }
}
