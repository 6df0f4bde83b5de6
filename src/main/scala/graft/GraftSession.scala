package graft

import org.apache.spark.sql.SparkSession

/** Production entry point: a SparkSession wired for this engine.
  *
  * The driver harnesses (Verify/Bench) build their own sessions; library
  * users start here. Config rationale, sized for real clusters:
  *   - AQE + skew-join splitting on: runtime re-planning replaces most
  *     manual salting (graft.ops.Skew covers the rest);
  *   - shuffle partitions ≈ 2-3× total cores (fine-grained enough for
  *     AQE coalescing to work with, not so many that task overhead wins);
  *   - 128 MB file-split target keeps scan tasks coarse at 100 TB;
  *   - GraftExtensions registers the native expressions + the TopKPerKey
  *     planner strategy at build time.
  */
object GraftSession {

  def recommendedConfigs(totalCores: Int): Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> (totalCores * 2).max(8).toString,
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.session.timeZone" -> "UTC")

  /** Additions for streaming jobs: RocksDB state store keeps large,
    * long-lived state (sessionization, streaming dedup sets) off-heap
    * with incremental (changelog) checkpoints — the default HDFS-backed
    * provider holds every key in executor heap and re-snapshots whole
    * maps, which fails first when state approaches memory at 100 TB
    * inputs. Merge over [[recommendedConfigs]] when the job runs
    * [[graft.streaming]] pipelines. */
  def streamingConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  def builder(master: String, totalCores: Int): SparkSession.Builder =
    recommendedConfigs(totalCores).foldLeft(
      SparkSession.builder().master(master)) {
      case (b, (k, v)) => b.config(k, v)
    }
}
