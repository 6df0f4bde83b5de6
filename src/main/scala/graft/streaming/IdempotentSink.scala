package graft.streaming

import org.apache.spark.sql.DataFrame

/** Commit-log-gated idempotent parquet sink — the live twin of
  * [[graft.ops.StreamingModel.exactlyOnceSink]]'s batch model and the
  * exactly-once half of the A14 delivery contract (the at-least-once
  * source half is modeled by `pipe_ledger_replay`): Structured
  * Streaming's foreachBatch gives at-least-once re-delivery of a whole
  * epoch after a crash between sink write and source-checkpoint
  * advance, and the sink upgrades that to exactly-once by (a) writing
  * each epoch to its own deterministic directory `batch=<id>` and
  * (b) recording the id in a commit log via the classic
  * write-temp-then-atomic-rename protocol. A re-delivered batchId finds
  * its commit marker and is skipped WITHOUT rewriting data — readers of
  * the committed set never observe duplicates or partial epochs.
  *
  * At scale: the data write is the normal distributed parquet write;
  * only the one-file marker rename is driver-side — O(1) per epoch,
  * the same cost profile as Spark's own file-sink metadata log.
  *
  * Filesystem caveat: the default marker strategy relies on
  * `ATOMIC_MOVE`, which is a real rename only on a real filesystem
  * (local disk, HDFS, NFS). Object stores (S3/ABFS/GCS) implement
  * rename as copy+delete — non-atomic — so a deployment there injects
  * the conditional-put strategy through the [[MarkerCommit]] seam
  * instead (`ConditionalPutCommit`; protocol spec-witnessed over the
  * mock store the way `SnapshotDialect` witnesses T-SQL).
  */
object IdempotentSink {

  /** Process one delivered epoch. Returns true iff this call committed
    * the batch (false = duplicate delivery, suppressed — or a lost
    * marker-creation race under a multi-writer store, in which case
    * the OTHER writer committed the identical epoch). The marker
    * strategy is injectable ([[MarkerCommit]]): ATOMIC_MOVE rename by
    * default, conditional-put for object stores. */
  def processBatch(df: DataFrame, batchId: Long, root: String,
      markers: MarkerCommit = AtomicRenameCommit): Boolean = {
    val rootDir = new java.io.File(root)
    val commits = new java.io.File(rootDir, "_commits")
    commits.mkdirs()
    if (markers.exists(commits, batchId.toString))
      return false // re-delivery: already committed
    val dataDir = new java.io.File(rootDir, s"batch=$batchId")
    df.write.mode("overwrite").parquet(dataDir.getPath)
    // Create-once marker commit: a crash mid-write leaves no marker, so
    // the NEXT delivery rewrites the (possibly partial) data dir and
    // then commits — at-least-once upstream, exactly-once downstream.
    // The rows= stamp comes from the WRITTEN files' parquet footers,
    // not a second df.count() execution: counting the dataframe again
    // would re-run the whole epoch (~2× sink cost), and a
    // nondeterministic source could stamp a count that differs from
    // the data actually on disk — the footer total is by construction
    // the committed row count. Footer reads are metadata-only (no row
    // scan) and driver-side O(#part-files).
    markers.commit(commits, batchId.toString, s"rows=${writtenRows(dataDir)}")
  }

  /** Row count of a written parquet directory from its part files'
    * footer metadata — the committed count, read without re-executing
    * (or even re-scanning) anything. */
  private[streaming] def writtenRows(dataDir: java.io.File): Long = {
    val conf = new org.apache.hadoop.conf.Configuration()
    Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getPath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** Committed epochs, in order — what a downstream reader trusts. */
  def committedBatches(root: String,
      markers: MarkerCommit = AtomicRenameCommit): Seq[Long] = {
    val commits = new java.io.File(root, "_commits")
    markers.list(commits).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted
  }

  /** Attach as a foreachBatch sink on a streaming DataFrame. */
  def attach(df: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, root); ()
      }
      .start()
}
