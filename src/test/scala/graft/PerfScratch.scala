package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway timing harness (not a spec).
  * Run: sbt "Test/runMain graft.ops.PerfScratch [dataDir]"
  * (default: the round-14 Zipf soak corpus).
  *
  * Round 14 shape: does the salting in `join_salted_skew` actually WIN
  * on a hot-key corpus (VERDICT r13 ask #2)? The Zipf soak corpus gives
  * user 0 ~6% of all events; this A/Bs the shipped salted spelling
  * against the plain shuffle join with AQE skew-split on (Spark's own
  * answer) and with it off (the naive baseline a 100 TB plan must never
  * fall into), plus the max-task skew visible in each. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("target/soak/sf1_zipf")

    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"[perf] $label%-34s ${best._1}%6.2f s  rows=${best._2}")
    }

    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001").count() // warm

    def events = Util.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    def users = Util.table(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    def aggShape(j: org.apache.spark.sql.DataFrame) = j
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_event"))

    // the dim side is small enough to broadcast here; DISABLE broadcast
    // so the A/B isolates the SHUFFLE-join skew behavior the salting
    // targets (at 100 TB the dim that forces a shuffle join is the case
    // salting exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    time("salted (shipped spelling)") {
      aggShape(Skew.saltedEquiJoin(events, users, "user_id", 8))
        .queryExecution.toRdd.count()
    }
    time("plain join, AQE skew ON") {
      aggShape(events.join(users, "user_id")).queryExecution.toRdd.count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("plain join, AQE skew OFF") {
      aggShape(events.join(users, "user_id")).queryExecution.toRdd.count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // ---- crossover case: ONE key owns half the stream ----------------
    // Zipf-1 over 150k keys gives the hot partition only ~2x the mean —
    // not enough for salting to matter at local[32]. This is the regime
    // where it does: hot key = 50% of rows, with per-row work after the
    // join (a hash probe is too cheap to show task-level serialization;
    // real pipelines aggregate/transform the joined rows).
    def hotEvents = spark.range(0, 8000000L, 1, 32)
      .select(col("id").as("event_id"),
        when(pmod(col("id"), lit(2)) === 0, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(150000L))).as("user_id"),
        concat(lit("e"), pmod(col("id"), lit(5))).as("event_type"))
    def hotWork(j: org.apache.spark.sql.DataFrame) = j
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("pmod(xxhash64(event_id, c_mktsegment), 1000000000)"))
          .as("chk"))
    time("50%-hot: salted") {
      hotWork(Skew.saltedEquiJoin(hotEvents, users, "user_id", 32))
        .queryExecution.toRdd.count()
    }
    time("50%-hot: plain, AQE skew ON") {
      hotWork(hotEvents.join(users, "user_id")).queryExecution.toRdd.count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("50%-hot: plain, AQE skew OFF") {
      hotWork(hotEvents.join(users, "user_id")).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
