package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit CSV / JSON-lines readers and writers.
  *
  * Policy for scale: ALWAYS pass the schema. Schema inference is a full
  * extra pass over the data (and for JSON, a merge of per-record schemas)
  * — at 100 TB that's a second job before the first byte of real work.
  * `PERMISSIVE` + a corrupt-record column keeps a bad row from killing a
  * long job; the column makes the bad rows queryable instead of silent.
  */
object TextFormats {

  val CorruptCol = "_corrupt_record"

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", true).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar warehouse format Spark ships natively;
    * zlib by default, with the same predicate-pushdown/statistics story
    * as parquet. Schema comes from the file footer (self-describing),
    * so no explicit-schema overload is needed. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
