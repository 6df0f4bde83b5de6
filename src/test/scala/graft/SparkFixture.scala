package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

// Top-level case classes so product encoders resolve.
case class DocRow(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
case class EventRow(event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
    value: Double, props: String)
case class CustRow(c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
    c_mktsegment: String)
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)
case class LineRow(l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_tax: Double, l_returnflag: String, l_linestatus: String)
case class EmbRow(vec_id: Long, embedding: Array[Float], label: Int)

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep saveAsTable (bucketed-join spec) out of the repo working dir
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkFixture {
  val spark: SparkSession = TestSpark.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Write the given tables as `<tmpdir>/<name>.parquet` and return the dir —
    * the same layout the declared queries read, so edge-case fixtures run
    * through the exact production code path. */
  def fixtureDir(tables: (String, DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft-fixture").toFile.getAbsolutePath
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }
}
