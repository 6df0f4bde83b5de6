package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state: the attribution
  * pattern (click joins its impression within an event-time window).
  * Both sides carry watermarks and the join condition bounds the
  * event-time distance, so the state store can evict rows once the
  * watermark passes — without the time bound, stream-stream join state
  * grows forever; with it, state is O(window × rate) per key range.
  */
object StreamJoins {

  /** Inner-join clicks to impressions on id where the click lands within
    * `maxDelayMinutes` AFTER the impression. Works identically on batch
    * frames (tested both ways). Expects columns:
    * impressions(imp_id, imp_ts), clicks(imp_id, click_ts). */
  def attributedClicks(
      impressions: DataFrame, clicks: DataFrame, maxDelayMinutes: Int): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", s"$maxDelayMinutes minutes")
    val clk = clicks.withWatermark("click_ts", s"$maxDelayMinutes minutes")
    imp.join(clk,
      imp("imp_id") === clk("imp_id") &&
        clk("click_ts") >= imp("imp_ts") &&
        clk("click_ts") <= imp("imp_ts") + expr(s"INTERVAL $maxDelayMinutes MINUTES"),
      "inner")
      .select(imp("imp_id"), col("imp_ts"), col("click_ts"),
        ((unix_micros(col("click_ts")) - unix_micros(col("imp_ts"))) / 1000000L)
          .cast("long").as("delay_s"))
  }
}
