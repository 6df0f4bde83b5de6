package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when one side must broadcast-replicate against a hot key — e.g. a
  * power-law user_id joining a per-user dimension. Salting keeps the big
  * side's shuffle keys uniform: big rows get a random-but-deterministic
  * salt in [0, factor), the small side is replicated `factor` times, and
  * the join key becomes (key, salt).
  */
object Skew {

  /** Equi join `big ⋈ small` on `key`, with the big side salted `factor`
    * ways. Result equals `big.join(small, key)` exactly; only the shuffle
    * distribution changes. The salt is a deterministic hash of the whole
    * big-side row (pmod(hash(*), factor)), not rand() — retries and
    * speculative tasks must re-derive identical salts or the join
    * duplicates/loses rows. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive: $factor")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Frequency sketch of the hottest join keys — the planning-time probe
    * that decides whether salting is worth it (run on a sample at scale). */
  def topKeyShare(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("key"))
      .limit(topN)
}
