package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.DeltaLite
import graft.sources.DeltaLite.Action

/** Streaming → [[graft.sources.DeltaLite]] transaction-log table: each
  * micro-batch lands as one data file plus one ATOMIC commit at
  * version = batchId. This upgrades [[LakeSink]]'s epoch-directory
  * idempotency to versioned VISIBILITY: a reader replaying the log never
  * sees a batch's file until its commit exists, so a crash between
  * data-file write and commit leaves an invisible orphan (reclaimable),
  * never a half-visible batch — the stronger form of the reference's
  * A11/A14 overwrite-then-mark contract.
  *
  * Exactly-once output on at-least-once processing comes from TWO
  * idempotency layers: a replayed batch (same batchId) overwrites the
  * SAME data file, and [[DeltaLite.commit]] is a no-op when the
  * version's log file already exists. Deterministic batch content is
  * the foreachBatch replay contract this relies on (same as every
  * exactly-once foreachBatch sink).
  *
  * The per-batch `count()` that stamps row stats into the add action is
  * one extra pass over the (micro-batch-sized, not corpus-sized) batch —
  * the price of log-only vacuum planning downstream. */
object DeltaSink {

  /** The per-batch commit step, exposed for direct replay testing. */
  def commitBatch(tableDir: String)(batch: Dataset[Row], batchId: Long): Unit = {
    val rel = f"part_$batchId%05d.parquet"
    val n = batch.count()
    batch.write.mode("overwrite")
      .parquet(new java.io.File(tableDir, rel).getPath)
    DeltaLite.commit(tableDir, batchId, Seq(Action(batchId, "add", rel, n)))
  }

  /** Start an AvailableNow drain of `df` into the DeltaLite table at
    * `tableDir`, checkpointed at `checkpoint`. */
  def start(df: DataFrame, tableDir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch(commitBatch(tableDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
