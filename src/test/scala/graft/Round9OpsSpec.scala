package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.ops.{Relational, Text}

/** Targeted edge/property tests for the round-9 operators — the cases
  * the fixture-scale DuckDB gate never exercises. */
class Round9OpsSpec extends AnyFunSuite with SparkFixture
    with TableDrivenPropertyChecks {
  import spark.implicits._

  private def doc(id: Long, text: String, lang: String = "en",
      source: String = "src0") =
    DocRow(id, text, lang, source, text.length.toLong)

  // ---- events_cusum_shift: the window spelling IS the CUSUM recursion ----

  test("cusum: prefix-sum-minus-running-min equals the sequential fold") {
    // s_i = max(0, s_{i-1} + z_i)  ≡  S_i − min(0, min_{j≤i} S_j).
    // Property-check the identity on seeded random series with EXACT
    // decimal arithmetic — this is the algebraic fact the declared
    // query's shuffle-free window spelling rests on.
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val z = Seq.fill(n)(BigDecimal(rnd.nextInt(2001) - 1000, 3)) // ±1.000
      val seq = z.scanLeft(BigDecimal(0)) { (s, x) => (s + x).max(0) }.tail
      val prefix = z.scanLeft(BigDecimal(0))(_ + _).tail
      val win = prefix.zipWithIndex.map { case (s, i) =>
        s - (BigDecimal(0) +: prefix.take(i + 1)).min
      }
      assert(seq == win, s"identity failed for z=$z")
    }
  }

  test("cusum: sigma=0 type excluded; a volume burst trips the alarm") {
    val base = ts("2024-01-01 00:00:00").getTime
    def evs(day: Int, typ: String, k: Int, idBase: Long): Seq[EventRow] =
      (0 until k).map(j => EventRow(idBase + day * 100 + j,
        new Timestamp(base + day * 86400000L), 1L, typ, 1.0, "{}"))
    // 'flat' fires exactly once per day (sigma = 0 → excluded);
    // 'burst' holds a 9/11-alternating baseline for 20 days, then jumps
    // to 30/day for 5 — z_burst ≈ +1.49, so the CUSUM crosses h = 4 on
    // the third burst day while the baseline stays pinned at 0.
    val rows = (0 until 25).map(d => evs(d, "flat", 1, 0L).head) ++
      (0 until 20).flatMap(d => evs(d, "burst", if (d % 2 == 0) 9 else 11, 10000L)) ++
      (20 until 25).flatMap(d => evs(d, "burst", 30, 10000L))
    val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
    val out = Relational.eventsCusumShift(spark, dir).collect()
    assert(!out.exists(_.getAs[String]("event_type") == "flat"),
      "sigma=0 type must be excluded by the HAVING guard")
    val burst = out.find(_.getAs[String]("event_type") == "burst").get
    assert(burst.getAs[Long]("n_days") == 25)
    assert(burst.getAs[Long]("n_alarm_days") >= 1,
      "the burst must trip the CUSUM alarm")
    assert(burst.getAs[String]("first_alarm_day") >= "2024-01-21",
      "alarm cannot precede the burst")
  }

  // ---- text_gopher_rules: each rule fails in isolation ----

  test("gopher rules: each rule trips independently") {
    val stopRich = "join filter sort merge window join filter sort merge " +
      "window spark table query value data line scan part group hash"  // 20 toks
    val dir = fixtureDir("documents" -> spark.createDataset(Seq(
      doc(1, stopRich),                                   // passes all
      doc(2, "join filter"),                              // too short (f_len)
      doc(3, Seq.fill(20)("a").mkString(" ")),            // mean wl 1 (f_wordlen) + rep + stop
      doc(4, (1 to 20).map(i => s"token$i").mkString(" ")), // no stopwords (f_stop)
      doc(5, ("join filter sort merge window " +
        Seq.fill(15)("spark").mkString(" ")))             // top share 15/20 (f_rep)
    )).toDF)
    val r = Text.queries("text_gopher_rules")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 5)
    assert(row.getAs[Long]("n_fail_len") == 1)
    assert(row.getAs[Long]("n_fail_wordlen") >= 1)
    assert(row.getAs[Long]("n_fail_stop") >= 2)   // docs 3 and 4
    assert(row.getAs[Long]("n_fail_rep") >= 2)    // docs 3 and 5
    assert(row.getAs[Long]("n_pass") == 1)
    assert(row.getAs[Long]("first_fail") == 2)
  }

  // ---- dedup_url_canonical: every variant collapses ----

  test("url canonicalization collapses scheme/www/case/tracking/slash variants") {
    // doc_ids chosen so all map to host site0 (%25=0), path 0 (%400=0),
    // no surviving query (%4 in {0,3}): 0, 1200, 2000 — wait %4 of 2000=0 ✓
    // Simpler: drive the declared query on ids that provably collide.
    val ids = Seq(0L, 1200L, 2400L, 3600L) // all %25=0, %400=0, %3 varies, %4=0
    val dir = fixtureDir("documents" -> spark.createDataset(
      ids.map(i => doc(i, "spark table join"))).toDF)
    val out = Text.queries("dedup_url_canonical")(spark, dir).collect()
    assert(out.length == 1, s"expected one collapsed page, got ${out.toSeq}")
    assert(out.head.getAs[String]("canonical") == "site0.example.com/p/0")
    assert(out.head.getAs[Long]("n_variants") == 4)
    assert(out.head.getAs[Long]("min_doc") == 0L)
  }

  // ---- docs_temperature_sample: damping + budget discipline ----

  test("temperature sampling damps the head language and respects quotas") {
    // 80 en / 10 fr / 10 de: p_en = 0.8 → w_en = sqrt(.8)/Σ ≈ 0.586 < 0.8
    val rows = (1L to 80L).map(i => doc(i, "spark table join", "en")) ++
      (81L to 90L).map(i => doc(i, "spark table join", "fr")) ++
      (91L to 100L).map(i => doc(i, "spark table join", "de"))
    val dir = fixtureDir("documents" -> spark.createDataset(rows).toDF)
    val out = Text.queries("docs_temperature_sample")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = out("en"); val fr = out("fr")
    assert(en.getAs[Double]("weight") < 0.8 - 1e-6, "head language not damped")
    assert(fr.getAs[Double]("weight") > 0.1 + 1e-6, "tail language not boosted")
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_taken") ==
        math.min(r.getAs[Long]("quota"), r.getAs[Long]("n_docs")),
        s"taken != min(quota, n_docs) for ${r.getAs[String]("lang")}")
    }
    val totalTaken = out.values.map(_.getAs[Long]("n_taken")).sum
    assert(totalTaken <= 25, "sample exceeds the N/4 budget") // B = 100/4
  }
}
