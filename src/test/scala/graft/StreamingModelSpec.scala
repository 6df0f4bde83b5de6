package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{StreamingModel, Udaf}

class StreamingModelSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ev(id: Long, t: String, uid: Long = 1, typ: String = "click", v: Double = 1.0) =
    EventRow(id, ts(t), uid, typ, v, "{}")

  test("session gap: 29-minute gap keeps one session, 31-minute gap splits") {
    val dir = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 10:00:00"),
      ev(2, "2024-01-01 10:29:00"),          // 29 min → same session
      ev(3, "2024-01-01 11:00:01"),          // 31:01 after → new session
      ev(4, "2024-01-01 10:00:00", uid = 2)).toDF)
    val out = StreamingModel.sessionGap(spark, dir).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1)
    assert(u1.length == 2)
    assert(u1(0).getAs[Long]("n_events") == 2 && u1(0).getAs[Long]("duration_s") == 29 * 60)
    assert(u1(1).getAs[Long]("n_events") == 1 && u1(1).getAs[Long]("duration_s") == 0)
    assert(out.count(_.getAs[Long]("user_id") == 2) == 1)
  }

  test("late filter drops exactly the rows >1h behind the running max") {
    // arrival order = (user_id, event_id): user 2's old event arrives after
    // user 1 already advanced the watermark to 12:00
    val dir = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 12:00:00", uid = 1),
      ev(2, "2024-01-01 10:59:00", uid = 2),   // 61 min behind → dropped
      ev(3, "2024-01-01 11:01:00", uid = 3)).toDF)  // 59 min behind → kept
    val dropped = StreamingModel.lateFilter(spark, dir).collect().map(_.getAs[Long]("event_id")).toSet
    assert(dropped == Set(2L))
  }

  test("tumbling counts group by aligned hour") {
    val dir = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 10:05:00", v = 1.5),
      ev(2, "2024-01-01 10:55:00", v = 2.5),
      ev(3, "2024-01-01 11:00:00", v = 4.0)).toDF)
    val out = StreamingModel.tumblingCounts(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("win_start") == "2024-01-01 10:00:00")
    assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("sum_value") == 4.0)
  }

  test("hopping counts: every event lands in exactly 2 overlapping windows") {
    val dir = fixtureDir("events" -> Seq(
      ev(1, "2024-01-01 10:00:00"),   // on the slide boundary
      ev(2, "2024-01-01 10:29:59"),   // just inside the same slide
      ev(3, "2024-01-01 10:30:00")).toDF)
    val out = StreamingModel.hoppingCounts(spark, dir).collect()
      .map(r => r.getAs[String]("win_start") -> r.getAs[Long]("n")).toMap
    // windows: [09:30,10:30) gets e1,e2; [10:00,11:00) all 3; [10:30,11:30) e3
    assert(out == Map(
      "2024-01-01 09:30:00" -> 2L,
      "2024-01-01 10:00:00" -> 3L,
      "2024-01-01 10:30:00" -> 1L))
    assert(out.values.sum == 3L * 2)   // duration/slide = 2 windows per event
  }

  test("dedup model is chained-gap — stricter than dropDuplicatesWithinWatermark on a spanning burst") {
    // burst at t0, t0+50min, t0+100min: the chained rule suppresses both
    // followers (each within 1h of its predecessor); the real streaming
    // operator anchors at the last KEPT event, so t0+100min (≥1h after
    // t0) is kept. This fixture pins the documented divergence from both
    // sides.
    val rows = Seq(
      ev(1, "2024-01-01 10:00:00"),
      ev(2, "2024-01-01 10:50:00"),
      ev(3, "2024-01-01 11:40:00"))
    val dir = fixtureDir("events" -> rows.toDF)
    val model = StreamingModel.dedupWindow(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("n_suppressed")))).toMap
    assert(model("click") == ((1L, 2L)), "chained rule must suppress the whole burst")
    // The true streaming operator keeps the burst's tail once the
    // watermark has expired the anchor's state. Batch sequencing matters:
    // batch 1 delivers the burst head (state anchored at t0, expiry
    // t0+1h); batch 2 advances the watermark past the expiry via another
    // key; batch 3 delivers the tail event, which finds no state and is
    // KEPT — where the chained model suppressed it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val kept = mem.toDF.toDF("event_id", "ts", "user_id", "event_type")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val q = kept.writeStream.format("memory").queryName("dedup_wm_probe")
      .outputMode("append").start()
    try {
      mem.addData(Seq((1L, ts("2024-01-01 10:00:00"), 1L, "click"),
        (2L, ts("2024-01-01 10:50:00"), 1L, "click")))
      q.processAllAvailable()   // watermark → 09:50; state (1,click) expiry 11:00
      mem.addData(Seq((4L, ts("2024-01-01 12:30:00"), 2L, "click")))
      q.processAllAvailable()   // watermark → 11:30 > 11:00: state evicted
      mem.addData(Seq((3L, ts("2024-01-01 11:40:00"), 1L, "click")))
      q.processAllAvailable()   // no state for (1,click) → kept
    } finally q.stop()
    val streamed = spark.table("dedup_wm_probe").collect()
      .map(_.getAs[Long]("event_id")).sorted
    assert(streamed.toSeq == Seq(1L, 3L, 4L),
      s"dropDuplicatesWithinWatermark kept [${streamed.mkString(",")}] — expected 1,3,4")
  }

  test("weighted-avg UDAF computes sum(p*q)/sum(q) exactly") {
    val dir = fixtureDir("lineitem" -> Seq(
      LineRow(1, 2.0, 10.0, 0.0, 0.0, "A", "F"),
      LineRow(2, 8.0, 20.0, 0.0, 0.0, "A", "F"),
      LineRow(3, 1.0, 99.99, 0.0, 0.0, "R", "F")).toDF)
    val out = Udaf.weightedAvg(spark, dir).collect()
    val m = out.map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("wavg_price")).toMap
    assert(m("A") == 18.0) // (2*10 + 8*20) / 10
    assert(m("R") == 99.99)
  }
}
