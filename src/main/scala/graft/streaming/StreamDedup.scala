package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup with WATERMARK-BOUNDED seen-set state — the
  * reference's A7 idempotency check (`src/bak_unload.ps1:57-66`, "skip
  * what the state file already names") as a continuously-running runtime
  * at document granularity, and the streaming twin of the batch
  * `ops.Dedup.incremental` / `dedup_index_probe` pair.
  *
  * The scale property is the watermark bound: plain
  * `dropDuplicates("h")` on a stream keeps EVERY key ever seen — state
  * grows with the corpus and a 100 TB ingest eventually evicts or OOMs —
  * while `dropDuplicatesWithinWatermark` evicts each key once the
  * event-time watermark passes it, so state is O(arrival rate × horizon)
  * regardless of how long the stream runs. The trade is explicit:
  * duplicates separated by more than the horizon re-emit (at-least-once
  * dedup), which downstream sinks absorb with the same
  * overwrite-idempotent contract the reference's daily job relies on
  * (A14); exact global dedup stays a batch/standing-index concern
  * (`dedup_index_probe`).
  */
object StreamDedup {

  /** Keep the first arrival per content hash within the watermark
    * horizon. Works identically on batch frames (spec-tested both ways).
    * Expects columns: docs(doc_id, ts, text). */
  def dedupStream(docs: DataFrame, horizon: String): DataFrame =
    docs
      .withColumn("h", md5(col("text").cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("ts"), col("h"))
}
