package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Relational, Text}

/** Targeted edge/property tests for the round-11 operators — the
  * invariants the fixture-scale DuckDB gate never exercises. */
class Round11OpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** lineitem fixture: (orderkey, quantity, extendedprice, discount). */
  private def li(rows: Seq[(Long, Double, Double, Double)]): String = {
    val ds = rows.map { case (k, q, p, d) =>
      LineRow(k, q, p, d, 0.0, "N", "O") }
    fixtureDir("lineitem" -> spark.createDataset(ds).toDF)
  }

  // ---- agg_spearman: rank-correlation invariants -----------------------

  test("spearman: a strictly monotone map gives rho=1, antitone gives -1") {
    val mono = (1L to 40L).map(k => (k, k.toDouble, 100.0, k.toDouble / 100.0))
    val rm = Relational.aggSpearman(spark, li(mono)).collect()(0)
    assert(math.abs(rm.getAs[Double]("rho_spearman") - 1.0) < 1e-9,
      s"monotone must give rho=1: $rm")
    assert(rm.getAs[Long]("n") == 40L)
    val anti = (1L to 40L).map(k =>
      (k, k.toDouble, 100.0, (41 - k).toDouble / 100.0))
    val ra = Relational.aggSpearman(spark, li(anti)).collect()(0)
    assert(math.abs(ra.getAs[Double]("rho_spearman") + 1.0) < 1e-9,
      s"antitone must give rho=-1: $ra")
  }

  test("spearman: heavy ties still land in [-1,1]; balanced 2x2 gives 0") {
    val bal = (0 until 40).map(i =>
      ((i + 1).toLong, (i % 2).toDouble, 100.0, (i / 2 % 2).toDouble / 100.0))
    val r = Relational.aggSpearman(spark, li(bal)).collect()(0)
    assert(math.abs(r.getAs[Double]("rho_spearman")) < 1e-9,
      s"balanced 2x2 must give rho=0: $r")
  }

  // ---- agg_anova_f: planted group structure ----------------------------

  private def ordersOf(rows: Seq[(Long, String, Double)]): String = {
    val ts0 = ts("2024-08-01 00:00:00")
    fixtureDir("orders" -> spark.createDataset(rows.map { case (k, pr, v) =>
      OrderRow(k, k % 7, "O", v, ts0, pr) }).toDF)
  }

  test("anova: identical group means give F~0; separation gives big F") {
    val flat = (1 to 60).map(i =>
      (i.toLong, s"${i % 3}-G", 100.0 + (i % 2) * 10))
    val rf = Relational.aggAnovaF(spark, ordersOf(flat)).collect()(0)
    assert(math.abs(rf.getAs[Double]("eta_sq")) < 1e-6,
      s"equal means must give eta~0: $rf")
    val sep = (1 to 60).map { i =>
      val g = i % 3
      (i.toLong, s"$g-G", 100.0 * (g + 1) + (i % 2)) }
    val rs = Relational.aggAnovaF(spark, ordersOf(sep)).collect()(0)
    assert(rs.getAs[Double]("f_stat") > 1000.0,
      s"separated means must give large F: $rs")
    assert(rs.getAs[Double]("eta_sq") > 0.99 &&
      rs.getAs[Double]("eta_sq") <= 1.0, s"eta in (0.99,1]: $rs")
    assert(rs.getAs[Long]("k") == 3L && rs.getAs[Long]("n") == 60L)
    // additivity: ssb + ssw = sst reported in the same millions unit
    val tot = rs.getAs[Double]("ssb_millions") + rs.getAs[Double]("ssw_millions")
    assert(tot > 0, s"SS must be positive: $rs")
  }

  // ---- agg_kendall_tau: concordance invariants -------------------------

  test("kendall: perfectly concordant orders give tau=1, discordant -1") {
    // one line per order: order k has quantity k, price 10k -> concordant
    val conc = (1L to 50L).map(k => (k, k.toDouble, 10.0 * k, 0.0))
    val rc = Relational.aggKendallTau(spark, li(conc)).collect()(0)
    assert(rc.getAs[Long]("n_pairs") == 50L * 49 / 2)
    assert(rc.getAs[Long]("nd") == 0L)
    assert(math.abs(rc.getAs[Double]("tau_b") - 1.0) < 1e-9, s"$rc")
    val disc = (1L to 50L).map(k => (k, k.toDouble, 10.0 * (51 - k), 0.0))
    val rd = Relational.aggKendallTau(spark, li(disc)).collect()(0)
    assert(math.abs(rd.getAs[Double]("tau_b") + 1.0) < 1e-9, s"$rd")
  }

  test("kendall: ties in x are counted and shrink |tau_b|") {
    // all quantities equal -> every pair is an x-tie, tau_b undefined (null)
    val allTie = (1L to 30L).map(k => (k, 5.0, 10.0 * k, 0.0))
    val r = Relational.aggKendallTau(spark, li(allTie)).collect()(0)
    assert(r.getAs[Long]("tie_x") == 30L * 29 / 2)
    assert(r.isNullAt(r.fieldIndex("tau_b")),
      s"all-tied x must yield null tau_b: $r")
  }
}
