package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PipelineOps, Relational}

/** Edge cases the DuckDB oracle never exercises: empty input (ref A5),
  * single-row top-1 (ref A6's 1-element quirk), zero-match outer joins,
  * and the semi ⊎ anti partition property. */
class RelationalEdgeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def events(rows: EventRow*) = spark.createDataset(rows).toDF

  test("CDC upsert: update/delete/insert/keep each resolve correctly") {
    val d = ts("2024-01-01 00:00:00")
    val dir = fixtureDir("orders" -> Seq(
      OrderRow(5, 1, "O", 50.0, d, "1-URGENT"),    // keep
      OrderRow(10, 1, "O", 100.0, d, "1-URGENT"),  // update (+100)
      OrderRow(17, 1, "F", 70.0, d, "1-URGENT"),   // delete
      OrderRow(23, 1, "P", 30.0, d, "1-URGENT")    // keep; spawns insert 1000023
    ).toDF)
    val out = PipelineOps.upsertCdc(spark, dir).collect()
      .map(r => r.getAs[String]("st") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_price"),
          r.getAs[Long]("n_updated"), r.getAs[Long]("n_inserted")))).toMap
    assert(out("N") == ((1L, 42.5, 0L, 1L)))       // the synthetic insert
    assert(out("O") == ((2L, 250.0, 1L, 0L)))      // keep 50 + updated 200
    assert(out("P") == ((1L, 30.0, 0L, 0L)))       // untouched
    assert(!out.contains("F"))                     // deleted row's group gone
  }

  test("snapshot diff: added/removed/changed/unchanged classified with exact deltas") {
    val d = ts("2024-01-01 00:00:00")
    val dir = fixtureDir("orders" -> Seq(
      OrderRow(1, 1, "O", 10.0, d, "1-URGENT"),   // unchanged
      OrderRow(7, 1, "O", 20.0, d, "1-URGENT"),   // repriced +50
      OrderRow(13, 1, "F", 30.0, d, "1-URGENT"),  // dropped in next
      OrderRow(19, 1, "P", 40.0, d, "1-URGENT")   // unchanged; spawns 2000019
    ).toDF)
    val out = PipelineOps.snapshotDiff(spark, dir).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("price_delta")))).toMap
    assert(out("added") == ((1L, 99.99)))
    assert(out("removed") == ((1L, -30.0)))
    assert(out("changed") == ((1L, 50.0)))
    assert(out("unchanged") == ((2L, 0.0)))
  }

  test("SCD2 intervals: runs of equal types become versioned validity ranges") {
    val dir = fixtureDir("events" -> events(
      EventRow(1, ts("2024-01-01 00:00:00"), 1, "view", 0.0, "{}"),
      EventRow(2, ts("2024-01-02 00:00:00"), 1, "view", 0.0, "{}"),
      EventRow(3, ts("2024-01-03 00:00:00"), 1, "click", 0.0, "{}"),
      EventRow(4, ts("2024-01-04 00:00:00"), 1, "view", 0.0, "{}")))
    val out = PipelineOps.scd2Intervals(spark, dir).collect()
    assert(out.map(_.getAs[Long]("ver")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[String]("event_type")).toSeq ==
      Seq("view", "click", "view"))
    assert(out.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 1L))
    // each segment closes exactly where the next one opens; last is open
    assert(out(0).getAs[String]("valid_to_s") ==
      out(1).getAs[String]("valid_from_s"))
    assert(out(1).getAs[String]("valid_to_s") ==
      out(2).getAs[String]("valid_from_s"))
    assert(out(2).getAs[String]("valid_to_s") == "current")
  }

  test("latest snapshot: single-element input returns that element (ref A6 quirk)") {
    val dir = fixtureDir("events" ->
      events(EventRow(7, ts("2024-01-05 10:00:00"), 1, "click", 2.5, "{}")))
    val out = PipelineOps.latestSnapshot(spark, dir).collect()
    assert(out.length == 1 && out(0).getAs[Long]("event_id") == 7)
  }

  test("latest snapshot: empty input yields empty result (ref A5 guard)") {
    val dir = fixtureDir("events" -> events())
    assert(PipelineOps.latestSnapshot(spark, dir).isEmpty)
  }

  test("latest snapshot: ts tie broken by event_id desc") {
    val t = ts("2024-01-05 10:00:00")
    val dir = fixtureDir("events" -> events(
      EventRow(1, t, 1, "click", 1.0, "{}"),
      EventRow(2, t, 2, "view", 2.0, "{}")))
    assert(PipelineOps.latestSnapshot(spark, dir).collect()(0).getAs[Long]("event_id") == 2)
  }

  test("left outer join counts zero for customers with no orders") {
    val dir = fixtureDir(
      "customer" -> Seq(CustRow(1, "a", 0, 10.0, "B"), CustRow(2, "b", 0, 20.0, "B")).toDF,
      "orders" -> Seq(OrderRow(100, 1, "O", 50.0, ts("2024-01-01 00:00:00"), "1-URGENT")).toDF)
    val m = Relational.joinLeftOuter(spark, dir).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("n_orders")).toMap
    assert(m == Map(1L -> 1L, 2L -> 0L))
  }

  test("semi selects by 'O' orders, anti excludes by 'F' orders") {
    val dir = fixtureDir(
      "customer" -> (1L to 10L).map(i => CustRow(i, s"c$i", 0, 0.0, "B")).toDF,
      "orders" -> Seq(
        OrderRow(1, 2, "O", 1.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
        OrderRow(2, 5, "F", 1.0, ts("2024-01-02 00:00:00"), "1-URGENT")).toDF)
    val semi = Relational.joinSemi(spark, dir).collect().map(_.getAs[Long]("c_custkey")).toSet
    val anti = Relational.joinAnti(spark, dir).collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(semi == Set(2L))                      // only the open ('O') order counts
    assert(anti == (1L to 10L).toSet - 5L)       // only the finished ('F') order excludes
  }

  test("incremental anti keeps all events for users with no purchase mark") {
    val dir = fixtureDir("events" -> events(
      EventRow(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0, "{}"),
      EventRow(2, ts("2024-01-02 00:00:00"), 1, "purchase", 1.0, "{}"),
      EventRow(3, ts("2024-01-03 00:00:00"), 1, "view", 1.0, "{}"),
      EventRow(4, ts("2024-01-01 00:00:00"), 2, "view", 1.0, "{}")))
    val kept = PipelineOps.incrementalAnti(spark, dir).collect().map(_.getAs[Long]("event_id")).toSet
    assert(kept == Set(3L, 4L)) // 1,2 are at/before user 1's purchase mark
  }

  test("asof tolerance: fresh match carries gap, stale and missing matches null out") {
    val dir = fixtureDir(
      "events" -> events(
        EventRow(1, ts("2024-01-05 00:00:00"), 1, "view", 1.0, "{}"),  // 4 days after
        EventRow(2, ts("2024-01-31 00:00:00"), 1, "view", 1.0, "{}"),  // exactly 30 days
        EventRow(3, ts("2024-03-01 12:00:00"), 1, "click", 1.0, "{}"), // 60.5 days — stale
        EventRow(4, ts("2024-01-01 00:00:00"), 2, "view", 1.0, "{}")), // no order at all
      "orders" -> Seq(
        OrderRow(100, 1, "O", 10.0, ts("2024-01-01 00:00:00"), "1-URGENT")).toDF)
    val out = Relational.joinAsofTolerance(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(1).getAs[String]("order_date") == "2024-01-01" &&
      out(1).getAs[Long]("gap_days") == 4L)
    assert(out(2).getAs[String]("order_date") == "2024-01-01" &&
      out(2).getAs[Long]("gap_days") == 30L)          // boundary is inclusive
    assert(out(3).isNullAt(out(3).fieldIndex("order_date")) &&
      out(3).isNullAt(out(3).fieldIndex("gap_days"))) // match exists but stale
    assert(out(4).isNullAt(out(4).fieldIndex("order_date"))) // left row kept
    assert(out.size == 4)
  }

  test("compaction bins: prefix-sum binning packs whole files to the size target") {
    // 7 equal 1000-char files, target 2048: cum-before 0..6000 → bins
    // {0,0,0},{1,1},{2,2} — a bin closes once it holds ≥ target bytes,
    // files are never split, and coverage is exact.
    val docs = (1L to 7L).map(i => DocRow(i, "x", "en", "s0", 1000L))
    val dir = fixtureDir("documents" -> docs.toDF)
    val out = PipelineOps.compactionBins(spark, dir).collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getAs[Long]("n_files")).toSeq == Seq(3L, 2L, 2L))
    assert(out.map(_.getAs[Long]("bytes")).sum == 7000L)
    // bins tile the doc_id order: last_doc of bin b + 1 == first_doc of b+1
    assert(out(0).getAs[Long]("last_doc") + 1 == out(1).getAs[Long]("first_doc"))
    assert(out(1).getAs[Long]("last_doc") + 1 == out(2).getAs[Long]("first_doc"))
  }

  test("path trigrams count sliding per-user sequences, never crossing users") {
    val dir = fixtureDir("events" -> events(
      EventRow(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0, "{}"),
      EventRow(2, ts("2024-01-01 10:01:00"), 1, "view", 0.0, "{}"),
      EventRow(3, ts("2024-01-01 10:02:00"), 1, "click", 0.0, "{}"),
      EventRow(4, ts("2024-01-01 10:03:00"), 1, "view", 0.0, "{}"),
      EventRow(5, ts("2024-01-01 10:00:00"), 2, "view", 0.0, "{}"),
      EventRow(6, ts("2024-01-01 10:01:00"), 2, "click", 0.0, "{}")))
    // user 1 trigrams: (view,view,click), (view,click,view); user 2: none
    val out = Relational.eventsPathTrigrams(spark, dir).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"), r.getAs[String]("t3")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_users")))).toMap
    assert(out == Map(
      ("view", "view", "click") -> ((1L, 1L)),
      ("view", "click", "view") -> ((1L, 1L))))
  }

  test("MAD outliers: robust fence flags the spike; constant values flag nothing") {
    val t0 = ts("2024-01-01 10:00:00")
    val dir = fixtureDir("events" -> events(
      EventRow(1, t0, 1, "view", 1.0, "{}"),
      EventRow(2, t0, 2, "view", 1.0, "{}"),
      EventRow(3, t0, 3, "view", 1.0, "{}"),
      EventRow(4, t0, 4, "view", 1.0, "{}"),
      EventRow(5, t0, 5, "view", 100.0, "{}"),   // spike: adev 99 > fence 0
      EventRow(6, t0, 1, "click", 7.0, "{}"),
      EventRow(7, t0, 2, "click", 7.0, "{}")))   // constant: adev 0, never > 0
    val out = Relational.eventsMadOutliers(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med"),
          r.getAs[Double]("mad"), r.getAs[Long]("n_outliers")))).toMap
    assert(out("view") == ((5L, 1.0, 0.0, 1L)))  // MAD 0: majority constant
    assert(out("click") == ((2L, 7.0, 0.0, 0L)))
  }

  test("schema evolution: merged read nulls the column missing from v1 files") {
    val dir = fixtureDir("events" -> events(
      EventRow(2, ts("2024-01-01 10:00:00"), 7, "view", 1.5, "{}"),   // v1: no user col
      EventRow(4, ts("2024-01-01 11:00:00"), 7, "view", 2.0, "{}"),   // v1
      EventRow(3, ts("2024-01-01 12:00:00"), 8, "view", 0.5, "{}"),   // v2: user kept
      EventRow(5, ts("2024-01-01 13:00:00"), 8, "click", 1.0, "{}"))) // v2
    val m = PipelineOps.schemaEvolution(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_with_user"),
          r.getAs[Long]("n_users"), r.getAs[Double]("sum_value")))).toMap
    assert(m("view") == ((3L, 1L, 1L, 4.0)))  // two v1 rows lost user_id
    assert(m("click") == ((1L, 1L, 1L, 1.0)))
  }

  test("window_first_last: single-row partition has null nth_value(2), first==last") {
    val dir = fixtureDir("events" -> events(
      EventRow(1, ts("2024-01-01 10:00:00"), 1, "click", 5.5, "{}"),
      EventRow(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0, "{}"),
      EventRow(3, ts("2024-01-01 12:00:00"), 2, "click", 2.0, "{}")))
    val out = Relational.windowFirstLast(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(1).getAs[Double]("first_v") == 5.5 && out(1).getAs[Double]("last_v") == 5.5)
    assert(out(1).isNullAt(out(1).fieldIndex("second_v")))
    assert(out(2).getAs[Double]("last_v") == 2.0)   // full frame, not current-row
    assert(out(3).getAs[Double]("second_v") == 2.0)
  }

  test("approx_percentile: observed rank within n/accuracy of the target rank") {
    // The sketch contract (Greenwald–Khanna-style): for accuracy a, the
    // returned value's rank is within n/a of ⌈q·n⌉. Checked against the
    // real sf0.01 lineitem groups — the same data the declared (rows-only)
    // query runs on — for every (group, quantile) pair.
    val dir = "/root/testdata/sf0.01"
    val approx = Relational.aggPercentileApproxRaw(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val byFlag = graft.ops.Util.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    for ((flag, rows) <- byFlag) {
      val n = rows.length
      val tol = n.toDouble / Relational.PctApproxAccuracy + 1
      def checkRank(colName: String, outCol: String, q: Double): Unit = {
        val vals = rows.map(_.getAs[Double](colName)).sorted
        val got = approx(flag).getAs[Double](outCol)
        // rank range of `got` in the sorted multiset (handles duplicates)
        val lo = vals.indexWhere(_ >= got) + 1
        val hi = vals.lastIndexWhere(_ <= got) + 1
        val target = q * n
        assert(lo - tol <= target && target <= hi + tol,
          s"$flag.$outCol: value $got spans ranks [$lo,$hi], target $target ± $tol of n=$n")
        assert(vals.contains(got), s"$outCol must be a member of the input")
      }
      checkRank("l_quantity", "qty_p50", 0.5)
      checkRank("l_quantity", "qty_p90", 0.9)
      checkRank("l_extendedprice", "price_p50", 0.5)
    }
  }

  test("approx distinct is exact at small cardinality") {
    val dir = fixtureDir("events" -> events(
      (1L to 50L).map(i => EventRow(i, ts("2024-01-01 00:00:00"), i % 7, "click", 1.0, "{}")): _*))
    val n = Relational.aggApproxDistinctRaw(spark, dir).collect()(0).getAs[Long]("approx_users")
    assert(n == 7L)
  }

  test("asof nearest: tie goes backward, same-instant is gap 0, no-purchase user is null") {
    def e(id: Long, t: String, uid: Long, typ: String) =
      EventRow(id, ts(t), uid, typ, 1.0, "{}")
    val dir = fixtureDir("events" -> events(
      // user 1: click equidistant (1h) from purchases both sides → backward
      e(1, "2024-01-01 01:00:00", 1, "purchase"),
      e(2, "2024-01-01 02:00:00", 1, "click"),
      e(3, "2024-01-01 03:00:00", 1, "purchase"),
      // user 2: purchase exactly at the click instant → backward, gap 0
      e(4, "2024-01-02 00:00:00", 2, "purchase"),
      e(5, "2024-01-02 00:00:00", 2, "click"),
      // user 3: forward-only purchase
      e(6, "2024-01-03 00:00:00", 3, "click"),
      e(7, "2024-01-03 00:30:00", 3, "purchase"),
      // user 4: clicks but no purchases
      e(8, "2024-01-04 00:00:00", 4, "click")))
    val out = Relational.joinAsofNearest(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(2).getAs[String]("dir") == "backward" &&
      out(2).getAs[Long]("gap_us") == 3600L * 1000000)
    assert(out(5).getAs[String]("dir") == "backward" &&
      out(5).getAs[Long]("gap_us") == 0L)
    assert(out(6).getAs[String]("dir") == "forward" &&
      out(6).getAs[Long]("gap_us") == 1800L * 1000000)
    assert(out(8).isNullAt(out(8).fieldIndex("dir")) &&
      out(8).isNullAt(out(8).fieldIndex("gap_us")))
  }

  test("sequence match: non-overlapping cv*p counting and error flag") {
    def e(id: Long, t: String, uid: Long, typ: String) =
      EventRow(id, ts(t), uid, typ, 1.0, "{}")
    val dir = fixtureDir("events" -> events(
      // user 1 path: c v v p c p e  → 2 conversions, saw error
      e(1, "2024-01-01 00:00:01", 1, "click"),
      e(2, "2024-01-01 00:00:02", 1, "view"),
      e(3, "2024-01-01 00:00:03", 1, "view"),
      e(4, "2024-01-01 00:00:04", 1, "purchase"),
      e(5, "2024-01-01 00:00:05", 1, "click"),
      e(6, "2024-01-01 00:00:06", 1, "purchase"),
      e(7, "2024-01-01 00:00:07", 1, "error"),
      // user 2 path: c v s p → the signup breaks the cv*p run
      e(8, "2024-01-01 00:00:01", 2, "click"),
      e(9, "2024-01-01 00:00:02", 2, "view"),
      e(10, "2024-01-01 00:00:03", 2, "signup"),
      e(11, "2024-01-01 00:00:04", 2, "purchase")))
    val out = Relational.eventsSequenceMatch(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1).getAs[Long]("n_conversions") == 2L &&
      out(1).getAs[Boolean]("saw_error"))
    assert(out(1).getAs[String]("path_head") == "cvvpcpe")
    assert(out(2).getAs[Long]("n_conversions") == 0L &&
      !out(2).getAs[Boolean]("saw_error"))
  }

  test("streaks: islands split on type change, equal-length tie goes to greater type") {
    def e(id: Long, t: String, uid: Long, typ: String) =
      EventRow(id, ts(t), uid, typ, 1.0, "{}")
    val dir = fixtureDir("events" -> events(
      // user 1: vv cc → two runs of 2; tie → 'view' (> 'click')
      e(1, "2024-01-01 00:00:01", 1, "view"),
      e(2, "2024-01-01 00:00:02", 1, "view"),
      e(3, "2024-01-01 00:00:03", 1, "click"),
      e(4, "2024-01-01 00:00:04", 1, "click"),
      // user 2: v c v — three runs of 1, alternation splits islands
      e(5, "2024-01-01 00:00:01", 2, "view"),
      e(6, "2024-01-01 00:00:02", 2, "click"),
      e(7, "2024-01-01 00:00:03", 2, "view")))
    val out = Relational.eventsStreaks(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1).getAs[Long]("n_runs") == 2L &&
      out(1).getAs[Long]("max_len") == 2L &&
      out(1).getAs[String]("top_type") == "view")
    assert(out(2).getAs[Long]("n_runs") == 3L &&
      out(2).getAs[Long]("max_len") == 1L &&
      out(2).getAs[String]("top_type") == "view")
  }

  test("rfm: scores bounded in 1..5, same-day purchase gives r_days 0, rfm concatenates") {
    val out = Relational.eventsRfm(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(r.getAs[String]("rfm") == s"$rs$fs$ms")
      assert(r.getAs[Long]("r_days") >= 0)
    }
    assert(out.exists(_.getAs[Long]("r_days") == 0L),
      "the anchor user should have recency 0")
  }

  test("mom growth: first month has null deltas, later months consistent with lag") {
    val rows = Relational.aggMomGrowth(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 2)
    assert(rows.head.isNullAt(rows.head.fieldIndex("delta")) &&
      rows.head.isNullAt(rows.head.fieldIndex("growth")))
    val second = rows(1)
    val expected = BigDecimal(second.getAs[Double]("revenue")) -
      BigDecimal(rows.head.getAs[Double]("revenue"))
    assert(math.abs(second.getAs[Double]("delta") - expected.toDouble) < 1e-6)
  }

  test("unconverted clicks: drop counts never exceed click counts") {
    val rows = Relational.eventsUnconvertedClicks(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unconverted") <= r.getAs[Long]("n_clicks"))
      val rate = r.getAs[Double]("drop_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("approx aggregates: declared within-bound flags hold on sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val hll = Relational.aggApproxDistinct(spark, dir).collect()
    assert(hll.nonEmpty && hll.forall(_.getAs[Boolean]("within_bound")))
    val pct = Relational.aggPercentileApprox(spark, dir).collect()
    assert(pct.nonEmpty && pct.forall(r =>
      r.getAs[Boolean]("qty_p50_ok") && r.getAs[Boolean]("qty_p90_ok") &&
        r.getAs[Boolean]("price_p50_ok")))
  }

  test("resample ffill: grid carries last value forward, leading grid is null") {
    def e(id: Long, t: String, uid: Long, v: Double) =
      EventRow(id, ts(t), uid, "click", v, "{}")
    val dir = fixtureDir("events" -> events(
      e(1, "2024-01-01 00:00:00", 1, 5.0),
      e(2, "2024-01-03 00:00:00", 1, 7.0),
      e(3, "2024-01-02 13:00:00", 2, 9.0)))
    val out = Relational.eventsResampleFfill(spark, dir).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[String]("grid_date"), r.getAs[java.lang.Double]("v"), r.getAs[Long]("n_seen")))
    assert(u1.toSeq == Seq(
      ("2024-01-01", 5.0: java.lang.Double, 1L),
      ("2024-01-02", 5.0: java.lang.Double, 1L),
      ("2024-01-03", 7.0: java.lang.Double, 2L)))
    // user 2's only grid point (day start) precedes the event: null fill
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2(0).getAs[java.lang.Double]("v") == null
      && u2(0).getAs[Long]("n_seen") == 0L)
  }

  test("funnel: steps count only when strictly after the previous step") {
    def e(id: Long, t: String, uid: Long, typ: String) =
      EventRow(id, ts(t), uid, typ, 1.0, "{}")
    val dir = fixtureDir("events" -> events(
      // user 1 completes the funnel in order
      e(1, "2024-01-01 10:00:00", 1, "view"),
      e(2, "2024-01-01 11:00:00", 1, "click"),
      e(3, "2024-01-01 12:00:00", 1, "purchase"),
      // user 2's click PRECEDES the first view: no step 2, and the later
      // purchase can't attach either (its gate is t2)
      e(4, "2024-01-01 09:00:00", 2, "click"),
      e(5, "2024-01-01 10:00:00", 2, "view"),
      e(6, "2024-01-01 11:00:00", 2, "purchase"),
      // user 3 never views: not in the funnel at all
      e(7, "2024-01-01 10:00:00", 3, "purchase")))
    val out = Relational.eventsFunnel(spark, dir).collect()
    val depth = out.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("depth")).toMap
    assert(depth == Map(1L -> 3L, 2L -> 1L))
    val u1 = out.find(_.getAs[Long]("user_id") == 1L).get
    assert(u1.getAs[String]("t3_s").startsWith("2024-01-01 12:00:00"))
    val u2 = out.find(_.getAs[Long]("user_id") == 2L).get
    assert(u2.getAs[String]("t2_s") == null && u2.getAs[String]("t3_s") == null)
  }

  test("retention cohorts users by first day and counts at each offset") {
    def e(id: Long, t: String, uid: Long) =
      EventRow(id, ts(t), uid, "view", 1.0, "{}")
    val dir = fixtureDir("events" -> events(
      // user 1: cohort day 1, active days 1 and 3 (two events on day 3
      // must still count once — activity is distinct per (user, day))
      e(1, "2024-01-01 10:00:00", 1),
      e(2, "2024-01-03 09:00:00", 1),
      e(3, "2024-01-03 15:00:00", 1),
      // user 2: cohort day 2 only
      e(4, "2024-01-02 12:00:00", 2)))
    val out = Relational.eventsRetention(spark, dir).collect()
      .map(r => (r.getAs[String]("cohort_date"), r.getAs[Long]("day_offset"))
        -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 1L,
      ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L))
  }

  test("corr/slope from exact power sums: perfectly linear data gives 1.0 / 2.0") {
    // y = 2x exactly: corr must be exactly 1.0 and the slope exactly 2.0 —
    // the exact-decimal sums make this bit-precise, where a double
    // accumulator could land at 0.9999999….
    val rows = (1 to 10).map(i =>
      LineRow(i.toLong, i.toDouble, 2.0 * i, 0.0, 0.0, "A", "O"))
    val dir = fixtureDir("lineitem" -> rows.toDF)
    val r = Relational.aggCorrRegression(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("corr_qty_price") == 1.0)
    assert(r.getAs[Double]("regr_slope") == 2.0)
    // covar_pop of x=1..10, y=2x: E[xy]-E[x]E[y] = 2·Var(x) = 2·8.25 = 16.5
    assert(r.getAs[Double]("covar_pop") == 16.5)
  }

  test("mode breaks count ties by lexicographically smallest value") {
    def o(id: Long, status: String, prio: String) =
      OrderRow(id, 1, status, 1.0, ts("2024-01-01 00:00:00"), prio)
    val dir = fixtureDir("orders" -> Seq(
      // status O: 2-HIGH × 2 beats 1-URGENT × 1
      o(1, "O", "1-URGENT"), o(2, "O", "2-HIGH"), o(3, "O", "2-HIGH"),
      // status F: tie 1 vs 1 → '1-URGENT' < '5-LOW' wins
      o(4, "F", "5-LOW"), o(5, "F", "1-URGENT")).toDF)
    val out = Relational.aggMode(spark, dir).collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[String]("mode_priority"), r.getAs[Long]("n"))).toMap
    assert(out == Map("F" -> (("1-URGENT", 1L)), "O" -> (("2-HIGH", 2L))))
  }

  test("z-score flags the lone outlier; constant-valued users flag nothing") {
    def e(id: Long, uid: Long, v: Double) =
      EventRow(id, ts("2024-01-01 10:00:00"), uid, "click", v, "{}")
    val dir = fixtureDir("events" -> events(
      // user 1: five zeros and a 12 → z(12) = 10/√20 = √5 ≈ 2.2361
      e(1, 1, 0.0), e(2, 1, 0.0), e(3, 1, 0.0),
      e(4, 1, 0.0), e(5, 1, 0.0), e(6, 1, 12.0),
      // user 2: constant → σ = 0 → NaN z → never flagged
      e(7, 2, 5.0), e(8, 2, 5.0), e(9, 2, 5.0)))
    val out = Relational.eventsZscoreOutliers(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("event_id") == 6L)
    assert(out(0).getAs[Double]("z") == 2.2361)
  }

  test("gap detect: missing hour inside a span; single-hour spans have no gaps") {
    val dir = fixtureDir("events" -> events(
      // 'view' observed at 00, 01, 03 → hour 02 is the one gap
      EventRow(1, ts("2024-01-01 00:10:00"), 1, "view", 0.0, "{}"),
      EventRow(2, ts("2024-01-01 01:20:00"), 1, "view", 0.0, "{}"),
      EventRow(3, ts("2024-01-01 03:30:00"), 1, "view", 0.0, "{}"),
      // 'click' has a single observed hour → span is one slot, no gap
      EventRow(4, ts("2024-01-01 05:00:00"), 1, "click", 0.0, "{}")))
    val out = PipelineOps.gapDetect(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("event_type") == "view")
    assert(out(0).getAs[String]("missing_hour") == "2024-01-01 02:00:00.000000")
  }

  test("attribution: latest prior click wins, 24h boundary inclusive, no-click and later-click purchases unattributed") {
    val dir = fixtureDir("events" -> events(
      // user 1: two clicks before the purchase → the LATER click attributes
      EventRow(1, ts("2024-01-01 00:00:00"), 1, "click", 0.0, "{}"),
      EventRow(2, ts("2024-01-01 00:10:00"), 1, "click", 0.0, "{}"),
      EventRow(3, ts("2024-01-01 00:40:00"), 1, "purchase", 1.0, "{}"),
      // user 2: click only AFTER the purchase → unattributed
      EventRow(4, ts("2024-01-01 02:00:00"), 2, "purchase", 1.0, "{}"),
      EventRow(5, ts("2024-01-01 03:00:00"), 2, "click", 0.0, "{}"),
      // user 3: click exactly 86400s before → inclusive boundary attributes
      EventRow(6, ts("2024-01-01 00:00:00"), 3, "click", 0.0, "{}"),
      EventRow(7, ts("2024-01-02 00:00:00"), 3, "purchase", 1.0, "{}"),
      // user 4: click 86401s before → outside the lookback
      EventRow(8, ts("2024-01-01 00:00:00"), 4, "click", 0.0, "{}"),
      EventRow(9, ts("2024-01-02 00:00:01"), 4, "purchase", 1.0, "{}")))
    val out = Relational.eventsAttribution(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("attrib_click_id")),
          Option(r.getAs[java.lang.Long]("gap_s"))))).toMap
    assert(out(3L) == ((Some(2L), Some(1800L))), "latest prior click must win")
    assert(out(4L) == ((None, None)), "later click must not attribute")
    assert(out(7L) == ((Some(6L), Some(86400L))), "24h boundary is inclusive")
    assert(out(9L) == ((None, None)), "86401s is outside the lookback")
  }

  test("sessionize: the 30-min gap rule splits sessions on strictly-greater only") {
    val dir = fixtureDir("events" -> events(
      // user 1: gaps of exactly 30min (no split) then 30min+1s (split)
      EventRow(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0, "{}"),
      EventRow(2, ts("2024-01-01 00:30:00"), 1, "view", 2.0, "{}"),
      EventRow(3, ts("2024-01-01 01:00:01"), 1, "view", 4.0, "{}"),
      // user 2: single event → one zero-duration session
      EventRow(4, ts("2024-01-01 05:00:00"), 2, "view", 8.0, "{}")))
    val out = Relational.eventsSessionize(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Long]("max_sess_events"), r.getAs[Long]("total_dur_us"),
          r.getAs[Double]("sum_value")))).toMap
    assert(out(1L) == ((2L, 3L, 2L, 1800000000L, 7.0)),
      "exactly-30min stays in session; 30min+1s starts a new one")
    assert(out(2L) == ((1L, 1L, 1L, 0L, 8.0)))
  }

  test("forward as-of: next purchase at/after each click, same-instant inclusive, none after → null") {
    val dir = fixtureDir("events" -> events(
      EventRow(1, ts("2024-01-01 00:00:00"), 1, "click", 0.0, "{}"),   // → p at 00:10
      EventRow(2, ts("2024-01-01 00:10:00"), 1, "purchase", 0.0, "{}"),
      EventRow(3, ts("2024-01-01 00:20:00"), 1, "click", 0.0, "{}"),   // → p at 00:20 (tie)
      EventRow(4, ts("2024-01-01 00:20:00"), 1, "purchase", 0.0, "{}"),
      EventRow(5, ts("2024-01-01 00:30:00"), 1, "click", 0.0, "{}"),   // no later p → null
      EventRow(6, ts("2024-01-01 01:00:00"), 2, "click", 0.0, "{}")))  // user 2 has no p
    val out = Relational.joinAsofForward(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[String]("purchase_ts")),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong)))).toMap
    assert(out(1L) == ((Some("2024-01-01 00:10:00.000000"), Some(600000000L))))
    assert(out(3L) == ((Some("2024-01-01 00:20:00.000000"), Some(0L))),
      "a purchase at the same instant matches (<=)")
    assert(out(5L) == ((None, None)))
    assert(out(6L) == ((None, None)))
  }

  test("markov transitions: per-from probabilities are count ratios summing to 1") {
    val dir = fixtureDir("events" -> events(
      // user 1: view → click → view → purchase; user 2: view → click
      EventRow(1, ts("2024-01-01 00:00:00"), 1, "view", 0.0, "{}"),
      EventRow(2, ts("2024-01-01 00:01:00"), 1, "click", 0.0, "{}"),
      EventRow(3, ts("2024-01-01 00:02:00"), 1, "view", 0.0, "{}"),
      EventRow(4, ts("2024-01-01 00:03:00"), 1, "purchase", 0.0, "{}"),
      EventRow(5, ts("2024-01-01 00:00:00"), 2, "view", 0.0, "{}"),
      EventRow(6, ts("2024-01-01 00:01:00"), 2, "click", 0.0, "{}")))
    val rows = Relational.eventsMarkov(spark, dir).collect()
    val out = rows.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("n_from"), r.getAs[Double]("p")))).toMap
    assert(out(("view", "click")) == ((2L, 3L, 0.6667)))
    assert(out(("view", "purchase")) == ((1L, 3L, 0.3333)))
    assert(out(("click", "view")) == ((1L, 1L, 1.0)))
    // per-from probabilities are ratios n/n_from of the same totals
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == rs.head.getAs[Long]("n_from"))
    }
  }
}
