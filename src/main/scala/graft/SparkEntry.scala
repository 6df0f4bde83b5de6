package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query returns a deterministic, oracle-comparable frame:
  * fully ordered with a unique tie-break, floats rounded via exact decimal
  * sums, timestamps formatted as strings (see graft.ops.Util).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — the engine's canonical scan→hash-agg→sort plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineOps.queries ++ Relational.queries ++ Scalars.queries ++
      Text.queries ++ Vector.queries ++ Dedup.queries ++
      StreamingModel.queries ++ Udaf.queries ++ SqlSurface.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    PipelineOps.oracleSql ++ Relational.oracleSql ++ Scalars.oracleSql ++
      Text.oracleSql ++ Vector.oracleSql ++ Dedup.oracleSql ++
      StreamingModel.oracleSql ++ Udaf.oracleSql ++ SqlSurface.oracleSql
}
