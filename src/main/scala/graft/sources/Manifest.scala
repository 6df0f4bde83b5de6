package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's manifest format, parsed declaratively — ref A2/A3
  * (`src/bak_unload.ps1:22-36`): `azcopy list --output-type=text` emits one
  * line per blob, `INFO: <name>; Content Length: <n>`, and the script
  * splits on ";", keeps field 0, and strips the 6-char "INFO: " prefix
  * with `Substring(6)`.
  *
  * Here the same parse is three codegen'd expressions over a text scan —
  * a line-per-row map with no shuffle, so a manifest of any size streams.
  * Non-INFO lines (azcopy progress noise) are filtered out rather than
  * mis-parsed — the reference would take them as filenames; `:31`'s
  * ".zip" filter just happened to hide that.
  */
object Manifest {

  /** Parse manifest lines into (name, content_length). */
  def parse(lines: DataFrame): DataFrame =
    lines
      .filter(col("value").startsWith("INFO: "))
      .select(
        // split(";")[0] then drop the "INFO: " prefix — ref :29-35
        substring(element_at(split(col("value"), ";"), 1), 7, Int.MaxValue)
          .as("name"),
        regexp_extract(col("value"), "Content Length: (\\d+)", 1)
          .cast("long").as("content_length"))

  /** Read + parse a manifest file/dir produced by a lister. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** A4–A6 over a parsed manifest: latest artifact matching the suffix. */
  def latest(manifest: DataFrame, suffix: String): DataFrame =
    manifest
      .filter(col("name").contains(suffix))
      .orderBy(desc("name"))
      .limit(1)
}
