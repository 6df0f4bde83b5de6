package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-structure tests for the round-15 operators — each fixture
  * builds a configuration whose answer is known on paper, so a logic
  * slip shows up as a wrong VALUE, not just a gate mismatch. */
class Round15OpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // ---- IdempotentSink: the commit stamp must not re-execute the epoch

  test("IdempotentSink stamps the commit marker without re-executing the batch") {
    // The r14 spelling stamped `rows=` with df.count() — a SECOND full
    // execution of the epoch inside foreachBatch. An accumulator bumped
    // once per row proves the dataframe now executes exactly once (the
    // parquet write), and the marker still carries the correct count
    // (read back from the written files' footers, not the plan).
    import graft.streaming.IdempotentSink
    val root = java.nio.file.Files.createTempDirectory("graft_eos1x_").toString
    val acc = spark.sparkContext.longAccumulator("epoch_rows_executed")
    val df = spark.range(0, 100, 1, 4)
      .map { x => acc.add(1); x }
      .toDF("id")
    assert(IdempotentSink.processBatch(df, 3L, root), "first delivery must commit")
    assert(acc.value == 100L,
      s"epoch executed ${acc.value / 100.0}x (expected exactly once)")
    val marker = java.nio.file.Files.readString(
      java.nio.file.Path.of(root, "_commits", "3"))
    assert(marker == "rows=100", s"marker stamp: $marker")
  }
}
