package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("recommended configs scale shuffle partitions with cores, floor 8") {
    val c32 = GraftSession.recommendedConfigs(32)
    assert(c32("spark.sql.shuffle.partitions") == "64")
    assert(GraftSession.recommendedConfigs(2)("spark.sql.shuffle.partitions") == "8")
    assert(c32("spark.sql.extensions") == "graft.functions.GraftExtensions")
    assert(c32("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("cloud-storage configs use manifest-style committers, never rename-commit") {
    val s3 = GraftSession.cloudStorageConfigs("s3a")
    assert(s3("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(s3("spark.sql.sources.commitProtocolClass").endsWith("PathOutputCommitProtocol"))
    assert(s3("spark.hadoop.fs.s3a.connection.maximum").toInt > 96) // above the starving default
    val ab = GraftSession.cloudStorageConfigs("abfs")
    assert(ab("spark.hadoop.mapreduce.outputcommitter.factory.scheme.abfs")
      .endsWith("AzureManifestCommitterFactory"))
    intercept[IllegalArgumentException](GraftSession.cloudStorageConfigs("wasb"))
  }

  test("streaming configs select the RocksDB state store with changelog checkpoints") {
    val s = GraftSession.streamingConfigs
    assert(s("spark.sql.streaming.stateStore.providerClass").endsWith("RocksDBStateStoreProvider"))
    assert(s("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled") == "true")
  }
}
