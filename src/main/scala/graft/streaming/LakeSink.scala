package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming → data-lake sink via `foreachBatch` with epoch-keyed
  * idempotent overwrite — the production pattern for landing a stream in
  * parquet with exactly-once OUTPUT on top of at-least-once processing:
  * each micro-batch writes (mode=overwrite) into its own
  * `epoch=<batchId>` directory, so a batch replayed after a failure
  * rewrites the same directory instead of appending duplicates. This is
  * the reference's overwrite-idempotency contract (`src/bak_unload.ps1`
  * A11 destructive load + A14 commit-last) applied per micro-batch: the
  * checkpoint is the seen-set, the overwrite makes replays harmless.
  *
  * At 100 TB the epoch directories are what the compactor
  * (`sources.TableSinks.compact`) and the partition-layout writer roll
  * up downstream; `foreachBatch` is the only streaming sink that can
  * reuse every batch writer (partitionBy, bucketing, JDBC) unchanged.
  */
object LakeSink {

  /** Start an AvailableNow drain of `df` into `outDir/epoch=<batchId>`
    * directories, checkpointed at `checkpoint`. Restarting with the same
    * checkpoint resumes at the next unprocessed batch — processed
    * epochs are never re-emitted, unprocessed replays overwrite. */
  def start(df: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/epoch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
