package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import Util._

/** Typed-Aggregator (UDAF) surface.
  *
  * The buffer carries exact decimal sums (scala BigDecimal ⇒ Decimal in the
  * Tungsten buffer), so reduce/merge are associative+commutative and the
  * result is independent of partitioning — the property every distributed
  * aggregate needs at 100 TB, and the property that makes the DuckDB oracle
  * (decimal sums in SQL) hash-match.
  */
object Udaf {

  case class WBuf(sumPQ: BigDecimal, sumQ: BigDecimal)

  /** Quantity-weighted average price: sum(p·q)/sum(q). Inputs are doubles
    * holding 2-decimal values; `d2` recovers the exact decimal the same way
    * both engines' CAST(double AS DECIMAL(·,2)) does (HALF_UP). */
  object WeightedAvgAgg extends Aggregator[(Double, Double), WBuf, Double] {
    private def d2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
    def reduce(b: WBuf, in: (Double, Double)): WBuf =
      WBuf(b.sumPQ + d2(in._1) * d2(in._2), b.sumQ + d2(in._2))
    def merge(a: WBuf, b: WBuf): WBuf =
      WBuf(a.sumPQ + b.sumPQ, a.sumQ + b.sumQ)
    def finish(b: WBuf): Double =
      if (b.sumQ.signum == 0) 0.0 else b.sumPQ.toDouble / b.sumQ.toDouble
    def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Weighted average exercised per returnflag; the oracle re-derives the
    * same math in SQL, proving the Aggregator's arithmetic end to end. */
  def weightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvgAgg)
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        r4(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udaf_weighted_avg" -> (weightedAvg _))

  val oracleSql: Map[String, String] = Map(
    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
         floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE)
           / CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS wavg_price,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
