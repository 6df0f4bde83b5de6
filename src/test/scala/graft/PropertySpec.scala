package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Relational, Text}
import graft.multimodal.MultimodalOps

/** Algebraic invariants over generated inputs (SURVEY §5.2): properties
  * that hold for every input, not just the fixtures. Spark jobs per case
  * are expensive, so each property runs 5 deterministic ScalaCheck samples
  * (the scalatest bridge artifact isn't in the offline cache — generators
  * are driven directly with fixed seeds). */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Run `body` over 5 deterministic samples of `gen`. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      val sample = gen.pureApply(Gen.Parameters.default.withSize(12), Seed(42L + i))
      withClue(s"[seed=${42 + i}] $sample: ")(body(sample))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val wordGen = Gen.oneOf("join", "scan", "sort", "agg", "merge", "probe")
  private val textGen = Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))
  private val docsGen = Gen.nonEmptyListOf(textGen).map(_.zipWithIndex.map {
    case (t, i) => DocRow(i.toLong, t, "en", s"src${i % 2}", t.length.toLong)
  })

  test("dedup is idempotent: survivors are unique and re-dedup is identity") {
    forAll(docsGen) { docs =>
      val dir = fixtureDir("documents" -> docs.toDF)
      val out = Text.dedupExact(spark, dir).collect()
      val hashes = out.map(_.getAs[String]("h"))
      assert(hashes.distinct.length == hashes.length)
      assert(out.map(_.getAs[Long]("n_copies")).sum == docs.length)
      // survivor is the min doc_id of its content group
      val byText = docs.groupBy(_.text.trim.toLowerCase).values
        .map(_.map(_.doc_id).min).toSet
      assert(out.map(_.getAs[Long]("doc_id")).toSet == byText)
    }
  }

  test("semi ('O') and anti ('F') select by order status for any order set") {
    val ordersGen = Gen.listOf(Gen.zip(Gen.chooseNum(1L, 8L), Gen.oneOf("O", "F", "P")))
      .map(_.zipWithIndex.map { case ((ck, st), i) =>
        OrderRow(i.toLong, ck, st, 1.0, ts("2024-01-01 00:00:00"), "1-URGENT")
      })
    forAll(ordersGen) { orders =>
      val custs = (1L to 8L).map(i => CustRow(i, s"c$i", 0, 0.0, "B"))
      val dir = fixtureDir("customer" -> custs.toDF, "orders" -> orders.toDF)
      val semi = Relational.joinSemi(spark, dir).collect().map(_.getAs[Long]("c_custkey")).toSet
      val anti = Relational.joinAnti(spark, dir).collect().map(_.getAs[Long]("c_custkey")).toSet
      assert(semi == orders.filter(_.o_orderstatus == "O").map(_.o_custkey).toSet)
      assert(anti == custs.map(_.c_custkey).toSet --
        orders.filter(_.o_orderstatus == "F").map(_.o_custkey))
    }
  }

  test("chunking reconstructs the document: full coverage, 2-token overlap") {
    forAll(Gen.chooseNum(1, 40)) { n =>
      val toks = (1 to n).map(i => s"t$i")
      val dir = fixtureDir("documents" -> Seq(
        DocRow(1, toks.mkString(" "), "en", "s0", n.toLong)).toDF)
      val chunks = graft.ops.Text.chunkSplit(spark, dir).collect()
        .sortBy(_.getAs[Long]("chunk_idx"))
        .map(_.getAs[String]("chunk_text").split(" ").toSeq)
      // consecutive chunks overlap by exactly 2 tokens; dropping the
      // overlap reconstructs the original token sequence exactly
      chunks.sliding(2).foreach {
        case Array(a, b) => assert(a.takeRight(2) == b.take(2) || b.size < 2)
        case _ =>
      }
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(2))
      assert(rebuilt == toks)
    }
  }

  test("running sum's last row per user equals the user's total") {
    val evGen = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(1, 9999)))
      .map(_.zipWithIndex.map { case ((uid, cents), i) =>
        EventRow(i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"), uid, "click",
          cents / 100.0, "{}")
      })
    forAll(evGen) { evs =>
      val dir = fixtureDir("events" -> evs.toDF)
      val out = Relational.windowRunningSum(spark, dir).collect()
      val lastPerUser = out.groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.last.getAs[Double]("running") }
      val expected = evs.groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.map(e => BigDecimal(e.value)).sum.toDouble }
      lastPerUser.foreach { case (u, r) => assert(math.abs(r - expected(u)) < 1e-9) }
    }
  }

  test("token top-k counts sum to the corpus token count") {
    forAll(docsGen) { docs =>
      val dir = fixtureDir("documents" -> docs.toDF)
      val out = Text.tokenTopk(spark, dir).collect()
      // vocabulary is 6 words < k=20, so top-k covers every token
      assert(out.map(_.getAs[Long]("n")).sum == docs.map(_.text.split(" ").length).sum)
      assert(out.sliding(2).forall {
        case Array(a, b) =>
          val (na, nb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
          na > nb || (na == nb && a.getAs[String]("token") < b.getAs[String]("token"))
        case _ => true
      })
    }
  }

  test("char_entropy equals an independent reference for arbitrary strings") {
    // Reference: textbook -Σ p·log2 p over code-point frequencies —
    // algebraically different from the expression's log2(n) − Σk·log2(k)/n
    // form, so agreement checks the identity, not the implementation.
    def ref(s: String): Double = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) 0.0
      else {
        val n = cps.length.toDouble
        cps.groupBy(identity).values.map(_.length / n)
          .map(p => -p * (math.log(p) / math.log(2.0))).sum
      }
    }
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ü", "λ", "中", "😀")))
      .map(_.mkString)
    forAll(strGen) { s =>
      val got = graft.functions.CharEntropy.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(math.abs(got - ref(s)) < 1e-9, s"entropy mismatch for '$s'")
    }
  }

  test("char_entropy units are CODE POINTS: combining marks count separately, astral singly") {
    // Pins the cross-engine unit contract: DuckDB string_split(text, '')
    // enumerates code points — 'e'+U+0301 is TWO units (the mark is not
    // merged into a grapheme), U+1D11E (astral, 2 UTF-16 chars) is ONE.
    // The expression's codePointAt loop must agree or the oracle diverges
    // on any non-ASCII corpus even though the ASCII fixtures pass.
    def h(s: String): Double = graft.functions.CharEntropy.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // "é" as e + combining acute: 2 distinct units → entropy 1 bit
    assert(math.abs(h("é") - 1.0) < 1e-12)
    // astral char repeated: 1 distinct unit → entropy 0, n counted once per cp
    assert(h("𝄞𝄞") == 0.0)
    // mixed: 4 distinct code points (e, U+0301, U+1D11E, a) → 2 bits
    assert(math.abs(h("é𝄞a") - 2.0) < 1e-12)
  }

  test("token-budget sample is monotone and budget-respecting at every tested budget") {
    val dir = "/root/testdata/sf0.001"
    var prev = Set.empty[Long]
    for (budget <- Seq(500L, 2000L, 5000L, 50000L)) {
      val kept = graft.ops.PipelineOps.tokenBudgetKept(spark, dir, budget)
      val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      val toks = kept.agg(org.apache.spark.sql.functions.sum("n_tok"))
        .collect()(0).getLong(0)
      assert(prev.subsetOf(ids), s"budget $budget dropped previously kept docs")
      assert(toks <= budget, s"budget $budget exceeded: $toks")
      prev = ids
    }
    assert(prev.nonEmpty)
  }

  test("z-order interleave is a bijection: de-interleaving recovers (x, y)") {
    // the fence-tightness claim of pipe_zorder_layout rests on the
    // interleave being information-preserving — check it per-bit over
    // random 8-bit key pairs, and that the bucket prefix is exactly the
    // interleave of the two keys' high nibbles (the 16×16 grid claim)
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L)))) { xs =>
      import org.apache.spark.sql.functions._
      val df = xs.toDF("x", "y")
      // the PRODUCTION interleave expression, not a test-local re-spelling
      val z = graft.ops.PipelineOps.zorderCol(col("x"), col("y"), 8)
      val back = df.withColumn("z", z)
        .withColumn("x2", (0 until 8).map(i =>
          shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i))
          .reduce(_ bitwiseOR _))
        .withColumn("y2", (0 until 8).map(i =>
          shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i))
          .reduce(_ bitwiseOR _))
        .collect()
      back.foreach { r =>
        assert(r.getAs[Long]("x2") == r.getAs[Long]("x"), "x lost in interleave")
        assert(r.getAs[Long]("y2") == r.getAs[Long]("y"), "y lost in interleave")
        // bucket prefix = interleave of the two high nibbles: the driver-side
        // reference interleave over (x>>4, y>>4) must equal z>>8
        val (xv, yv, zv) =
          (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("z"))
        val refBucket = (0 until 4).map { i =>
          ((((xv >> 4) >> i) & 1L) << (2 * i)) | ((((yv >> 4) >> i) & 1L) << (2 * i + 1))
        }.reduce(_ | _)
        assert((zv >> 8) == refBucket, "bucket is not the high-nibble grid cell")
      }
    }
  }

  test("rollup merge equals the full recompute at EVERY cutover day") {
    // pipe_rollup_merge fixes one cutover; mergeability must hold for any
    // split — partial aggregates re-aggregated == aggregate of the whole.
    import org.apache.spark.sql.functions._
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1, 28), Gen.chooseNum(0, 4), Gen.chooseNum(0.0, 99.0)))
      .map(_.zipWithIndex.map { case ((day, t, v), i) =>
        EventRow(i.toLong, ts(f"2024-01-$day%02d 12:00:00"), 1L,
          s"type$t", math.round(v * 100.0) / 100.0, "{}")
      })
    forAll(Gen.zip(evGen, Gen.chooseNum(1, 28))) { case (evs, cutDay) =>
      val dir = fixtureDir("events" -> spark.createDataset(evs).toDF)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type"),
            graft.ops.Util.dateS(date_trunc("DAY", col("ts"))).cast("string").as("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(graft.ops.Util.Qty)).as("sv"))
      val e = graft.ops.Util.table(spark, dir, "events")
      val cut = lit(f"2024-01-$cutDay%02d").cast("timestamp")
      val merged = agg(e.filter(col("ts") < cut)).union(agg(e.filter(col("ts") >= cut)))
        .groupBy("event_type", "day")
        .agg(sum(col("n")).as("n"), sum(col("sv")).cast("double").as("sv"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val full = agg(e)
        .select(col("event_type"), col("day"), col("n"),
          col("sv").cast("double").as("sv"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(merged == full, s"cutover day $cutDay broke mergeability")
    }
  }

  test("BpeMergeOnce equals the sequential scan for any token array and pair") {
    // The native loop is load-bearing for text_bpe_merge/_train; the
    // reference below IS the definition (left-to-right, non-overlapping).
    // Two-letter alphabet makes (x, x) overlap runs common.
    def ref(toks: List[String], t1: String, t2: String): (List[String], Long) = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var nm = 0L
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == t1 && toks(i + 1) == t2) {
          out += s"${t1}_$t2"; nm += 1; i += 2
        } else { out += toks(i); i += 1 }
      }
      (out.toList, nm)
    }
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.oneOf("a", "b")),
      Gen.oneOf("a", "b"), Gen.oneOf("a", "b"))
    forAll(gen) { case (toks, t1, t2) =>
      import org.apache.spark.sql.functions._
      val got = Seq(Tuple1(toks)).toDF("toks")
        .select(graft.functions.BpeMergeOnce.mergeOnce(
          col("toks"), lit(t1), lit(t2)).as("m"))
        .select(col("m.toks"), col("m.nm")).collect()(0)
      assert((got.getSeq[String](0).toList, got.getLong(1)) == ref(toks, t1, t2))
    }
  }

  test("stub decoder features are pure in the payload bytes") {
    forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { payloads =>
      whenever(payloads.nonEmpty) {
        val recs = payloads.zipWithIndex.map { case (p, i) =>
          graft.multimodal.MediaRecord(i.toLong, "image", p.getBytes("UTF-8"), Map())
        }
        val out = MultimodalOps.decodeAndFeaturize(spark.createDataset(recs), 4)
          .collect().sortBy(_.id)
        payloads.zipWithIndex.foreach { case (p, i) =>
          assert(out(i).features.toSeq ==
            MultimodalOps.FakeDecoder.features(p.getBytes("UTF-8")).toSeq)
        }
      }
    }
  }

  test("rolling slope recovers an affine series' coefficient exactly") {
    // y = a + b·rn with 2-dec a, b: every window sum is an exact double,
    // the OLS numerator is exactly b × denominator, and the division is
    // exact — slope == b at every frame with n ≥ 2, for ANY a, b.
    val coefGen = for {
      a <- Gen.choose(-5000, 5000); b <- Gen.choose(-300, 300)
      n <- Gen.choose(2, 12)
    } yield (a / 100.0, b / 100.0, n)
    forAll(coefGen) { case (a, b, n) =>
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val rows = (1 to n).map(i => EventRow(i.toLong,
        new java.sql.Timestamp(base + i * 60000L), 7L, "view", a + b * i, "{}"))
      val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
      val out = Relational.windowRollingSlope(spark, dir).collect()
      out.filter(_.getAs[Long]("n") >= 2).foreach { r =>
        assert(r.getAs[Double]("slope") == b,
          s"affine series a=$a b=$b: slope at rn=${r.getAs[Long]("rn")}")
      }
    }
  }

  test("holt on a constant series forecasts the constant at every horizon") {
    // l₁ = c, b₁ = 0; each step keeps l = c, b = 0 exactly (r6 of an
    // on-grid 2-dec constant is itself) — so yhat(h) == c for all h.
    val cGen = for { c <- Gen.choose(1, 99999); n <- Gen.choose(2, 20) } yield (c / 100.0, n)
    forAll(cGen) { case (c, n) =>
      val base = java.sql.Timestamp.valueOf("2024-03-01 12:00:00").getTime
      val rows = (0 until n).map(d => EventRow(d.toLong,
        new java.sql.Timestamp(base + d.toLong * 86400000L), 1L, "purchase", c, "{}"))
      val dir = fixtureDir("events" -> spark.createDataset(rows).toDF)
      val out = Relational.eventsHoltForecast(spark, dir).collect()
      assert(out.length == 7)
      out.foreach { r =>
        assert(r.getAs[Double]("trend") == 0.0)
        assert(r.getAs[Double]("yhat") == c,
          s"constant $c over $n days: yhat at h=${r.getAs[Long]("h")}")
      }
    }
  }

  test("prefix boilerplate accounting is conservative: flags partition the corpus") {
    forAll(docsGen) { docs =>
      val dir = fixtureDir("documents" -> docs.toDF)
      val out = Text.dedupPrefixBoilerplate(spark, dir).collect()
      assert(out.length == docs.length, "one row per document, always")
      // flagged docs' prefix_df ≥ 3 and equals the count of corpus docs
      // sharing that prefix; unflagged docs keep their full length
      val byPrefix = docs.groupBy(d =>
        d.text.split(" ").take(2).mkString(" ")).view.mapValues(_.size).toMap
      out.foreach { r =>
        val (pfx, df) = (r.getAs[String]("prefix"), r.getAs[Long]("prefix_df"))
        if (r.getAs[Long]("is_boilerplate") == 1L) {
          assert(df == byPrefix(pfx) && df >= 3L)
          assert(r.getAs[Long]("kept_chars") ==
            math.max(docs(r.getAs[Long]("doc_id").toInt).text.length - pfx.length - 1, 0))
        } else {
          assert(byPrefix(pfx) < 3L)
          assert(r.getAs[Long]("kept_chars") ==
            docs(r.getAs[Long]("doc_id").toInt).text.length)
        }
      }
    }
  }
}
