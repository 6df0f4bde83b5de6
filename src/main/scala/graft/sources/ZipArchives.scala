package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Opaque-archive source — ref A8/A9 (`src/bak_unload.ps1:68-76`: azcopy
  * download + `7z e` extract). Spark reads gzip/snappy-framed formats
  * natively inside the scan; zip containers are opaque, so they ride in as
  * `binaryFile` rows and are expanded executor-side with `java.util.zip`
  * in a mapPartitions — each archive is one task, entries stream out
  * without materializing the whole archive inventory on any single node.
  *
  * 100 TB note: archives parallelize by file; a pathological single huge
  * zip is inherently serial (the format has no split points), which is the
  * same constraint every engine has — the fix is upstream (more, smaller
  * archives), not in the reader.
  */
object ZipArchives {

  /** One extracted archive entry. */
  final case class ZipEntryRow(
      archive: String, entry: String, n_bytes: Long, content: Array[Byte])

  /** Read every `*.zip` under `path` and explode their entries.
    * Directory entries are skipped; content is fully materialized per
    * entry (archives carry snapshot-sized payloads, ref A12). */
  def readEntries(spark: SparkSession, path: String): Dataset[ZipEntryRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (archive, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map { e =>
            val content = zin.readAllBytes()
            ZipEntryRow(archive.split('/').last, e.getName, content.length.toLong, content)
          }.toList // drain eagerly: the stream dies with this row's iterator
      })
  }

  /** Manifest view (names+sizes only) — the A10 "pick the .bak inside the
    * extracted folder" step as a DataFrame: filter + deterministic max
    * (the reference's last-wins loop at `:79-88` is iteration-order
    * nondeterministic; we replace it with an explicit ordering).
    *
    * Reads through the [[ZipEntriesSource]] DSv2 connector: `content` is
    * never projected, so the scan prunes it and a local archive's scan
    * touches ONLY the central directory — the binaryFile path this
    * replaced materialized every archive in full to answer a
    * names-and-sizes question, a whole-corpus read at 100 TB. The
    * `contains` predicate pushes into the scan too. */
  def latestEntryMatching(spark: SparkSession, path: String, suffix: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("graft.sources.ZipEntriesSource").load(path)
      .filter(col("entry").contains(suffix))
      .orderBy(desc("entry"))
      .limit(1)
      .select(col("archive"), col("entry"), col("n_bytes"))
  }
}
