package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Relational, Text, Vector => VOps}

/** Edge/property tests for the late-round-9 statistics + clustering
  * operators — the cases the fixture-scale DuckDB gate never reaches. */
class StatsOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val t0 = ts("2024-01-01 00:00:00").getTime
  private def ev(id: Long, typ: String, value: Double) =
    EventRow(id, new Timestamp(t0 + id * 1000), id % 7, typ, value, "{}")

  // ---- agg_ks_test ----

  test("ks: identical distributions give D=0 and the p bound clamps to 1") {
    val rows = (0 until 50).flatMap(i =>
      Seq(ev(i * 2, "purchase", (i % 5) + 1.0), ev(i * 2 + 1, "click", (i % 5) + 1.0)))
    val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
    val r = Relational.aggKsTest(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 50 && r.getAs[Long]("n2") == 50)
    assert(r.getAs[Double]("d_stat") == 0.0)
    assert(r.getAs[Double]("p_bound") == 1.0, "2·exp(0) must clamp via least(1,·)")
  }

  test("ks: disjoint supports give D=1 at the boundary value") {
    val rows = (0 until 30).map(i => ev(i, "purchase", 1.0 + (i % 3))) ++
      (0 until 40).map(i => ev(100 + i, "click", 50.0 + (i % 4)))
    val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
    val r = Relational.aggKsTest(spark, dir).collect().head
    assert(r.getAs[Double]("d_stat") == 1.0)
    assert(r.getAs[Double]("p_bound") < 1e-6)
  }

  // ---- agg_mann_whitney ----

  test("mann-whitney: hand-computed U on a tiny sample with ties") {
    // purchase: {1, 2, 2}, click: {2, 3}
    // pooled sorted: 1(r1) 2 2 2 (avg rank (2+3+4)/3 = 3) 3(r5)
    // R1 = 1 + 3 + 3 = 7; U1 = 7 − 3·4/2 = 1; μ = 3·2/2 = 3
    val rows = Seq(ev(1, "purchase", 1.0), ev(2, "purchase", 2.0),
      ev(3, "purchase", 2.0), ev(4, "click", 2.0), ev(5, "click", 3.0))
    val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
    val r = Relational.aggMannWhitney(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 3 && r.getAs[Long]("n2") == 2)
    assert(r.getAs[Double]("u_stat") == 1.0)
    assert(r.getAs[Double]("u_mean") == 3.0)
    // tie-corrected σ² = (6/12)·(6 − (3³−3)/(5·4)) = 2.4 → z = −2/√2.4
    assert(math.abs(r.getAs[Double]("z_stat") - (-2.0 / math.sqrt(2.4))) < 1e-6)
  }

  // ---- agg_mutual_info ----

  test("mutual info: independent columns give MI ≈ 0, dependence gives MI = H") {
    // independent: every (nation, segment) cell equally filled
    val ind = for (n <- 0 until 4; s <- 0 until 4; k <- 0 until 5)
      yield CustRow(n * 100 + s * 10 + k, s"c$n$s$k", n, 10.0, s"SEG$s")
    val dIndep = fixtureDir("customer" -> spark.createDataset(ind).toDF)
    val ri = Relational.aggMutualInfo(spark, dIndep).collect().head
    assert(math.abs(ri.getAs[Double]("mi")) < 1e-9)
    assert(math.abs(ri.getAs[Double]("nmi")) < 1e-9)
    // deterministic: segment = f(nation) → MI = H(X) = H(Y), NMI = 1
    val dep = for (n <- 0 until 4; k <- 0 until 5)
      yield CustRow(n * 10 + k, s"c$n$k", n, 10.0, s"SEG$n")
    val dDep = fixtureDir("customer" -> spark.createDataset(dep).toDF)
    val rd = Relational.aggMutualInfo(spark, dDep).collect().head
    assert(math.abs(rd.getAs[Double]("mi") - rd.getAs[Double]("h_x")) < 1e-5)
    assert(math.abs(rd.getAs[Double]("nmi") - 1.0) < 1e-5)
  }

  // ---- text_readability ----

  test("readability: sentence floor, vowel-group syllables, per-source agg") {
    val docs = Seq(
      DocRow(1, "the cat sat", "en", "a", 11),          // no punct → s=1
      DocRow(2, "go now! stop. yes?", "en", "b", 18),   // 3 sentence runs
      DocRow(3, "zzz bcd fgh", "en", "c", 11))          // zero vowel groups
    val dir = fixtureDir("documents" -> spark.createDataset(docs).toDF)
    val out = Text.queries("text_readability")(spark, dir).collect()
    val a = out.find(_.getAs[String]("source") == "a").get
    // words=3 sentences=1 syllables=3 (e/a/a): FRE = 206.835 − 1.015·3 − 84.6·1
    assert(math.abs(a.getAs[Double]("avg_fre") -
      (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9)
    assert(a.getAs[Double]("syll_per_word") == 1.0)
    val b = out.find(_.getAs[String]("source") == "b").get
    assert(b.getAs[Long]("n_words") == 4) // "go now! stop. yes?" splits to 4
    val c = out.find(_.getAs[String]("source") == "c").get
    assert(c.getAs[Double]("syll_per_word") == 0.0)
  }

  // ---- cluster_dbscan_grid ----

  test("dbscan grid: two separated blobs cluster apart; sparse points are noise") {
    def emb(id: Long, x: Float, y: Float) =
      EmbRow(id, Array(x, y) ++ Array.fill(62)(0.0f), 0)
    // blob A: 2 adjacent cells near origin, 4 pts each (core, eps=0.08)
    val blobA = (0 until 4).map(i => emb(i, 0.01f, 0.01f)) ++
      (0 until 4).map(i => emb(10 + i, 0.09f, 0.01f))
    // blob B: one core cell far away (≥2 empty cells between → no bridge)
    val blobB = (0 until 5).map(i => emb(100 + i, -0.31f, -0.31f))
    // noise: 2 lone points in distinct cells
    val lone = Seq(emb(200, 0.25f, -0.25f), emb(201, -0.15f, 0.2f))
    val dir = fixtureDir("embeddings" ->
      spark.createDataset(blobA ++ blobB ++ lone).toDF)
    val out = VOps.clusterDbscanGrid(spark, dir).collect()
    val noise = out.find(_.getAs[String]("label") == "noise").get
    assert(noise.getAs[Long]("n_cells") == 2 && noise.getAs[Long]("n_pts") == 2)
    val clusters = out.filterNot(_.getAs[String]("label") == "noise")
    assert(clusters.length == 2, s"expected 2 clusters, got ${clusters.toSeq}")
    assert(clusters.map(_.getAs[Long]("n_pts")).sorted.toSeq == Seq(5L, 8L))
    assert(clusters.map(_.getAs[Long]("n_cells")).sorted.toSeq == Seq(1L, 2L))
  }

  // ---- empty-input degradation for the late-round-9 surface ----

  test("late-round ops degrade cleanly on empty inputs (no throw, no bogus rows)") {
    val dir = fixtureDir(
      "events" -> spark.createDataset(Seq.empty[EventRow]).toDF,
      "documents" -> spark.createDataset(Seq.empty[DocRow]).toDF,
      "embeddings" -> spark.createDataset(Seq.empty[EmbRow]).toDF,
      "customer" -> spark.createDataset(Seq.empty[CustRow]).toDF,
      "lineitem" -> spark.createDataset(Seq.empty[LineRow]).toDF)
    // grouped aggregates/joins must yield ZERO rows on empty input
    val emptyOut = Seq("agg_mutual_info", "agg_raking_weights",
      "agg_trimmed_mean", "events_metric_decomposition",
      "cluster_dbscan_grid", "simsearch_mips", "simsearch_rrf_hybrid",
      "join_spatial_grid", "dedup_chunk_minhash", "dedup_lsh_calibration",
      "graph_label_propagation", "agg_dp_counts", "text_readability")
    emptyOut.foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      // global-agg queries legally emit one all-null row; everything
      // keyed must emit nothing
      assert(n <= 1, s"$q emitted $n rows on empty input")
    }
    // the two global-agg stats emit their single row with null stats
    Seq("agg_ks_test", "agg_mann_whitney").foreach { q =>
      val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.length == 1, s"$q should emit its one global-agg row")
    }
  }

  // ---- pipe_datagen_profile ----

  test("datagen: regenerates bit-identically and covers the declared ranges") {
    val a = graft.ops.PipelineOps.pipeDatagenProfile(spark, "unused").collect()
    val b = graft.ops.PipelineOps.pipeDatagenProfile(spark, "other").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "generation must be input-independent and run-deterministic")
    assert(a.map(_.getAs[Long]("n_rows")).sum == 10000L)
    assert(a.length == 20) // all 20 sources populated (id % 20)
    a.foreach { r =>
      val m = r.getAs[Double]("mean_tokens")
      assert(m >= 10.0 && m <= 100.0, s"mean_tokens out of range: $m")
    }
  }

  // ---- events_metric_decomposition ----

  test("metric decomposition: effects sum exactly to the delta on hand data") {
    // first half (days 0-4): 10 purchases of 2.0; second (days 6-10):
    // 15 purchases of 3.0. delta = 45−20 = 25; volume = 5·2 = 10;
    // rate = 10·1 = 10; interaction = 5·1 = 5.
    val base = ts("2024-01-01 00:00:00").getTime
    def e(id: Long, day: Int, v: Double) = EventRow(id,
      new Timestamp(base + day * 86400000L), 1L, "purchase", v, "{}")
    val rows = (0 until 10).map(i => e(i, i % 5, 2.0)) ++
      (0 until 15).map(i => e(100 + i, 6 + i % 5, 3.0))
    val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
    val r = Relational.eventsMetricDecomposition(spark, dir).collect().head
    assert(r.getAs[Double]("delta_total") == 25.0)
    assert(r.getAs[Double]("volume_effect") == 10.0)
    assert(r.getAs[Double]("rate_effect") == 10.0)
    assert(r.getAs[Double]("interaction") == 5.0)
    assert(r.getAs[Double]("volume_effect") + r.getAs[Double]("rate_effect") +
      r.getAs[Double]("interaction") == r.getAs[Double]("delta_total"))
  }

  // ---- agg_trimmed_mean ----

  test("trimmed/winsorized means: hand-computed on 1..20 with lower-rule bounds") {
    val rows = (1 to 20).map(i => LineRow(i.toLong, 1.0, i.toDouble,
      0.0, 0.0, "A", "O"))
    val dir = fixtureDir("lineitem" -> spark.createDataset(rows).toDF)
    val r = Relational.aggTrimmedMean(spark, dir).collect().head
    // lower-rule P5 = 1, P95 = 19: trim drops only 20; winsorize maps it to 19
    assert(r.getAs[Long]("n") == 20 && r.getAs[Long]("n_kept") == 19)
    assert(r.getAs[Double]("mean_raw") == 10.5)
    assert(r.getAs[Double]("mean_trimmed") == 10.0)
    assert(r.getAs[Double]("mean_winsorized") == 10.45)
  }

  // ---- dedup_lsh_calibration ----

  test("lsh calibration: exact dups land in bucket 9 with capture 1; curves order") {
    val x = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(1L, 2L, 3L).map(i => DocRow(i, x, "en", "a", 0)) ++
      Seq(DocRow(10, "unrelated words entirely here now", "en", "a", 0))
    val dir = fixtureDir("documents" -> spark.createDataset(docs).toDF)
    val out = graft.ops.Dedup.dedupLshCalibration(spark, dir).collect()
    val b9 = out.find(_.getAs[Long]("bucket") == 9L).get
    assert(b9.getAs[Long]("n_obs") == 3) // the 3 identical-pair candidates
    assert(b9.getAs[Double]("mean_jac") == 1.0)
    assert(b9.getAs[Double]("p_b2r3") == 1.0)
    assert(b9.getAs[Double]("est_true_pairs") == 3.0)
    // for a fixed K=6 signature, more bands of shorter rows capture more
    out.foreach { r =>
      assert(r.getAs[Double]("p_b6r1") >= r.getAs[Double]("p_b3r2"))
      assert(r.getAs[Double]("p_b3r2") >= r.getAs[Double]("p_b2r3"))
    }
  }

  // ---- graph_label_propagation ----

  test("label propagation: two exact-dup clusters resolve to two communities") {
    // Identical texts share every band signature → each group is one
    // LSH bucket (a star rooted at its min doc_id). With the self-vote
    // and min-label tie-break, four rounds settle each star on its
    // root label; the two groups never mix.
    val x = "alpha beta gamma delta epsilon zeta"
    val y = "one two three four five six"
    val docs = Seq(1L, 2L, 3L).map(i => DocRow(i, x, "en", "a", 0)) ++
      Seq(11L, 12L, 13L).map(i => DocRow(i, y, "en", "b", 0))
    val dir = fixtureDir("documents" -> spark.createDataset(docs).toDF)
    val out = graft.ops.Dedup.graphLabelPropagation(spark, dir).collect()
    val byComm = out.map(r =>
      r.getAs[Long]("community") -> r.getAs[Long]("n_members")).toMap
    assert(byComm == Map(1L -> 3L, 11L -> 3L),
      s"expected two 3-member communities rooted at 1 and 11: $byComm")
  }

  // ---- agg_raking_weights ----

  test("raking: two IPF rounds pull both margins near uniform targets") {
    // skewed 2×2 table: nations {0,1} × segments {A,B}, counts
    // 30/10/10/10 — uniform targets are 30 per row and per column.
    val cust =
      (0 until 30).map(i => CustRow(i, s"a$i", 0, 1.0, "SEGA")) ++
      (0 until 10).map(i => CustRow(100 + i, s"b$i", 0, 1.0, "SEGB")) ++
      (0 until 10).map(i => CustRow(200 + i, s"c$i", 1, 1.0, "SEGA")) ++
      (0 until 10).map(i => CustRow(300 + i, s"d$i", 1, 1.0, "SEGB"))
    val dir = fixtureDir("customer" -> spark.createDataset(cust).toDF)
    val out = Relational.aggRakingWeights(spark, dir).collect()
    assert(out.length == 4)
    val wn = out.map(r => ((r.getAs[Int]("x"), r.getAs[String]("y")),
      r.getAs[Double]("weighted_n"))).toMap
    // margins after the final COLUMN step: columns match targets near-
    // exactly; rows are one step behind (IPF alternation) but far
    // closer to 30/30 than the raw 40/20 start.
    val colA = wn((0, "SEGA")) + wn((1, "SEGA"))
    val colB = wn((0, "SEGB")) + wn((1, "SEGB"))
    assert(math.abs(colA - 30.0) < 0.01 && math.abs(colB - 30.0) < 0.01)
    val row0 = wn((0, "SEGA")) + wn((0, "SEGB"))
    assert(math.abs(row0 - 30.0) < 1.5,
      s"row margin after 2 rounds should be near target, got $row0")
    // weights deflate the over-represented cell, inflate the rare ones
    val w = out.map(r => ((r.getAs[Int]("x"), r.getAs[String]("y")),
      r.getAs[Double]("weight"))).toMap
    assert(w((0, "SEGA")) < 1.0 && w((1, "SEGB")) > 1.0)
  }

  // ---- agg_dp_counts ----

  test("dp counts: seeded Laplace noise matches the closed form per key") {
    val cust = (0 until 30).map(i =>
      CustRow(i, s"c$i", i % 3, 10.0, s"SEG${i % 2}"))
    val dir = fixtureDir("customer" -> spark.createDataset(cust).toDF)
    val out = Relational.aggDpCounts(spark, dir).collect()
    // independent JVM-side reimplementation of the seeded mechanism
    def expectedNoise(key: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp|$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.take(15), 16).toDouble / 1.152921504606846976e18
      val c = u - 0.5
      val raw = -(1.0 / 0.5) * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      math.floor(raw * 1e4 + 0.5) / 1e4
    }
    out.foreach { r =>
      val key = r.getAs[String]("key")
      assert(r.getAs[Double]("noise") == expectedNoise(key),
        s"noise mismatch for key $key")
      assert(r.getAs[Double]("epsilon") == 0.5)
    }
    // both granularities released; n_true preserved exactly
    assert(out.count(_.getAs[String]("level") == "nation") == 3)
    assert(out.count(_.getAs[String]("level") == "nation_segment") == 6)
    assert(out.filter(_.getAs[String]("level") == "nation")
      .map(_.getAs[Long]("n_true")).sum == 30)
  }

  // ---- simsearch_rrf_hybrid ----

  test("rrf hybrid: rank-1 in both lists fuses to 2/61 and tops the output") {
    // doc/vec 1 is the best lexical match AND the closest vector to the
    // probe (vec 0); doc 2 is second in both. RRF is exactly
    // 1/(60+rb) + 1/(60+rv) with absent-list contribution 0.
    def v(id: Long, x: Float, y: Float) =
      EmbRow(id, Array(x, y) ++ Array.fill(62)(0.0f), 0)
    val docs = Seq(
      DocRow(1, "join filter sort merge window join filter sort", "en", "a", 0),
      DocRow(2, "join filter red blue green yellow pink grey", "en", "b", 0),
      DocRow(3, "red blue green yellow pink grey black white", "en", "c", 0))
    val vecs = Seq(v(0, 1f, 0f), v(1, 0.99f, 0.14f), v(2, 0.7f, 0.71f),
      v(3, 0f, 1f))
    val dir = fixtureDir(
      "documents" -> spark.createDataset(docs).toDF,
      "embeddings" -> spark.createDataset(vecs).toDF)
    val out = VOps.simsearchRrfHybrid(spark, dir).collect()
    val top = out.head
    assert(top.getAs[Long]("doc_id") == 1L)
    assert(top.getAs[Long]("rank_bm25") == 1L && top.getAs[Long]("rank_vec") == 1L)
    assert(math.abs(top.getAs[Double]("rrf") -
      math.floor((2.0 / 61.0) * 1e6 + 0.5) / 1e6) < 1e-12)
    // doc 3 has no lexical signal: rank_bm25 must be null, vec side real
    val d3 = out.find(_.getAs[Long]("doc_id") == 3L).get
    assert(d3.isNullAt(d3.fieldIndex("rank_bm25")))
    assert(d3.getAs[Long]("rank_vec") > 0L)
  }

  // ---- dedup_chunk_minhash ----

  test("chunk minhash: shared paragraph links docs; same-doc repeats excluded") {
    // A and B open with the IDENTICAL 8-token paragraph (chunk 0 in
    // both — guaranteed LSH collision, jac 1.0) then diverge. C repeats
    // its own (different) paragraph internally: every chunk pair it
    // forms is same-doc and must be excluded. D is unrelated filler.
    val p = "alpha beta gamma delta epsilon zeta eta theta"
    val q = "one two three four five six seven eight"
    val docs = Seq(
      DocRow(1, s"$p red blue green yellow", "en", "a", 0),
      DocRow(2, s"$p north south east west", "en", "b", 0),
      DocRow(3, s"$q $q", "en", "c", 0),
      DocRow(4, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12", "en", "d", 0))
    val dir = fixtureDir("documents" -> spark.createDataset(docs).toDF)
    val out = graft.ops.Dedup.dedupChunkMinhash(spark, dir).collect()
    assert(out.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L && r.getAs[Long]("n_near") >= 1),
      s"docs 1,2 share chunk 0 verbatim — must pair: ${out.toSeq}")
    assert(!out.exists(r => r.getAs[Long]("doc_a") == 3L ||
      r.getAs[Long]("doc_b") == 3L),
      "doc 3's repeats are same-doc chunk pairs — must be excluded")
  }

  // ---- simsearch_mips ----

  test("mips: weighted inner product reorders what cosine would rank") {
    // probe = e1. Corpus: v10 ∥ e1 with weight 1 (label 0) → ip 1.0;
    // v11 at cos 0.6 to e1 but weight 2 (label 4) → ip 1.2. Cosine
    // ranks v10 first; MIPS must rank v11 first.
    def v(id: Long, x: Float, y: Float, label: Int) =
      EmbRow(id, Array(x, y) ++ Array.fill(62)(0.0f), label)
    val rows = Seq(
      v(0, 1f, 0f, 0),                       // the probe (lowest id)
      v(10, 1f, 0f, 0),                      // cos 1.0, w 1.0 → ip 1.0
      v(11, 0.6f, 0.8f, 4),                  // cos 0.6, w 2.0 → ip 1.2
      v(12, 0f, 1f, 0))                      // cos 0,  w 1.0 → ip 0
    val dir = fixtureDir("embeddings" -> spark.createDataset(rows).toDF)
    val out = VOps.simsearchMips(spark, dir).collect()
      .filter(_.getAs[Long]("probe_id") == 0L)
    assert(out.head.getAs[Long]("neighbor_id") == 11L,
      "MIPS must prefer the high-norm vector over the perfectly-aligned one")
    assert(out.head.getAs[Double]("ip") == 1.2)
    assert(out(1).getAs[Long]("neighbor_id") == 10L)
    assert(out(1).getAs[Double]("ip") == 1.0)
  }

  test("dbscan grid: all-sparse input yields only the noise row") {
    def emb(id: Long, x: Float) =
      EmbRow(id, Array(x, 0.0f) ++ Array.fill(62)(0.0f), 0)
    val dir = fixtureDir("embeddings" ->
      spark.createDataset((0 until 6).map(i => emb(i, -0.3f + i * 0.1f))).toDF)
    val out = VOps.clusterDbscanGrid(spark, dir).collect()
    assert(out.length == 1 && out.head.getAs[String]("label") == "noise")
    assert(out.head.getAs[Long]("n_pts") == 6)
  }
}
