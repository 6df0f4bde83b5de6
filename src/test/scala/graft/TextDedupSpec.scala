package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Text}

class TextDedupSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def doc(id: Long, text: String, source: String = "s0", lang: String = "en") =
    DocRow(id, text, lang, source, text.length.toLong)

  test("bpe merge: same-token runs merge left-to-right non-overlapping") {
    // winning pair is (a, a) — the only case where occurrences can
    // overlap; a run a^L must merge ⌊L/2⌋ pairs anchored left.
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a a a a a"), doc(2, "a a a"), doc(3, "a a b a a a a"),
      doc(4, "b a a"), doc(5, "a")).toDF)
    val out = Text.bpeMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[String]("merged_text") == "a_a a_a a")
    assert(out(1).getAs[Long]("n_merges") == 2)
    assert(out(2).getAs[String]("merged_text") == "a_a a")
    assert(out(3).getAs[String]("merged_text") == "a_a b a_a a_a")
    assert(out(4).getAs[String]("merged_text") == "b a_a")
    assert(out(5).getAs[String]("merged_text") == "a")
    assert(out(5).getAs[Long]("n_merges") == 0)
  }

  test("exact dedup collapses identical content to min doc_id") {
    val dir = fixtureDir("documents" -> Seq(
      doc(3, "a b c"), doc(1, "a b c"), doc(2, "x y")).toDF)
    val out = Text.dedupExact(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("doc_id") == 1 && out(0).getAs[Long]("n_copies") == 2)
    assert(out(1).getAs[Long]("doc_id") == 2 && out(1).getAs[Long]("n_copies") == 1)
  }

  test("exact dedup is idempotent") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a b"), doc(2, "a b"), doc(3, "c")).toDF)
    val once = Text.dedupExact(spark, dir)
    val dir2 = fixtureDir("documents" ->
      once.join(Seq(doc(1, "a b"), doc(2, "a b"), doc(3, "c")).toDF, "doc_id")
        .select("doc_id", "text", "lang", "source", "n_chars"))
    val twice = Text.dedupExact(spark, dir2).collect()
    assert(twice.map(_.getAs[Long]("doc_id")).toSeq == once.collect().map(_.getAs[Long]("doc_id")).toSeq)
    assert(twice.forall(_.getAs[Long]("n_copies") == 1))
  }

  test("identical docs in one source have Jaccard 1.0") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a b c"), doc(2, "a b c"), doc(3, "q r s t", source = "s1")).toDF)
    val out = Text.dedupNearJaccard(spark, dir).collect()
    val s0 = out.find(_.getAs[String]("source") == "s0").get
    assert(s0.getAs[Long]("n_pairs") == 1 && s0.getAs[Long]("n_near") == 1)
    assert(s0.getAs[Double]("avg_jac") == 1.0)
  }

  test("chunked bitmask spans >64-token vocabularies exactly") {
    // 90-token vocabulary forces multi-word masks: doc1 = t0..t59,
    // doc2 = t30..t89 → |∩| = 30, |∪| = 90, Jaccard = 1/3 exactly.
    val t1 = (0 until 60).map(i => s"t$i").mkString(" ")
    val t2 = (30 until 90).map(i => s"t$i").mkString(" ")
    val dir = fixtureDir("documents" -> Seq(doc(1, t1), doc(2, t2)).toDF)
    val out = Text.dedupNearJaccard(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_pairs") == 1)
    assert(out(0).getAs[Double]("avg_jac") == math.floor(1.0 / 3.0 * 1e4 + 0.5) / 1e4)
  }

  test("vocab build assigns dense ids by frequency desc, token asc") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "b a b c a b")).toDF)
    val out = Text.vocabBuild(spark, dir).collect()
      .map(r => (r.getAs[Long]("token_id"), r.getAs[String]("token"), r.getAs[Long]("n")))
    assert(out.toSeq == Seq((0L, "b", 3L), (1L, "a", 2L), (2L, "c", 1L)))
  }

  test("chunk split: overlap, boundary, and short-doc edge cases") {
    val t14 = (1 to 14).map(i => s"w$i").mkString(" ")   // 2 chunks: 1..8, 7..14
    val t8 = (1 to 8).map(i => s"w$i").mkString(" ")     // exactly one window
    val dir = fixtureDir("documents" -> Seq(
      doc(1, t14), doc(2, t8), doc(3, "a b")).toDF)
    val out = Text.chunkSplit(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text"), r.getAs[Long]("n_tok")))
    assert(out.toSeq == Seq(
      (1L, 0L, (1 to 8).map(i => s"w$i").mkString(" "), 8L),
      (1L, 1L, (7 to 14).map(i => s"w$i").mkString(" "), 8L),
      (2L, 0L, t8, 8L),
      (3L, 0L, "a b", 2L)))
  }

  test("quality score handles single-token documents (no div-by-zero)") {
    val dir = fixtureDir("documents" -> Seq(doc(1, "join")).toDF)
    val r = Text.qualityScore(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tok") == 1)
    assert(r.getAs[Double]("stop_ratio") == 1.0)
    assert(r.getAs[Double]("avg_tok_len") == 4.0)
  }

  test("fingerprint is token-order invariant, distinct-count is not fooled by repeats") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a b c"), doc(2, "c b a"), doc(3, "a a a")).toDF)
    val out = Text.fingerprint(spark, dir).collect()
    assert(out(0).getAs[String]("fp_minhash") == out(1).getAs[String]("fp_minhash"))
    assert(out(2).getAs[Long]("n_uniq_tok") == 1)
  }

  test("minhash LSH surfaces identical docs as verified candidates") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a b c d e f"), doc(2, "a b c d e f"), doc(3, "z y x w v u")).toDF)
    val out = Dedup.minhashLsh(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_candidates") >= 1 && out(0).getAs[Long]("n_verified") >= 1)
  }

  test("simhash buckets identical docs together") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a b c d"), doc(2, "a b c d")).toDF)
    val out = Dedup.simhash(spark, dir).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_docs") == 2)
  }

  test("token top-k breaks count ties by token ascending") {
    val dir = fixtureDir("documents" -> Seq(doc(1, "b a b a c")).toDF)
    val out = Text.tokenTopk(spark, dir).collect()
    assert(out.map(_.getAs[String]("token")).toSeq == Seq("a", "b", "c"))
  }

  test("cc groups: identical docs form one component rooted at min doc_id") {
    val dir = fixtureDir("documents" -> Seq(
      doc(5, "a b c d e f"), doc(2, "a b c d e f"), doc(9, "a b c d e f"),
      doc(3, "z y x w v u"), doc(7, "z y x w v u"),
      doc(11, "lone wolf doc q")).toDF)
    val out = Dedup.ccGroups(spark, dir).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("root"), r.getAs[Long]("n_members"))).toMap
    assert(byDoc(2L) == (2L, 3L) && byDoc(5L) == (2L, 3L) && byDoc(9L) == (2L, 3L))
    assert(byDoc(3L) == (3L, 2L) && byDoc(7L) == (3L, 2L))
    assert(!byDoc.contains(11L)) // no candidate pair -> not in the graph
  }

  test("edit distance: zero for identical candidate texts, sim in [0,1]") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a b c d e f"), doc(2, "a b c d e f"), doc(3, "a b c d e g")).toDF)
    val out = Dedup.editDistance(spark, dir).collect()
    assert(out.nonEmpty)
    val p12 = out.find(r => r.getAs[Long]("d1") == 1L && r.getAs[Long]("d2") == 2L).get
    assert(p12.getAs[Long]("lev") == 0L && p12.getAs[Double]("sim") == 1.0)
    out.foreach { r =>
      val s = r.getAs[Double]("sim"); assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("bm25: higher tf wins within a term; rarer term carries higher idf") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "join join join a b"),
      doc(2, "join a b c d"),
      doc(3, "filter a b c d")).toDF)
    val out = Text.bm25(spark, dir).collect()
    val join1 = out.filter(_.getAs[String]("token") == "join")
    assert(join1.map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"))).toSeq
      == Seq((1L, 1L), (2L, 2L)))
    // df(filter)=1 < df(join)=2 ⇒ idf larger; tf and dl equal across docs 2/3
    val fJoin = out.find(r => r.getAs[String]("token") == "join" && r.getAs[Long]("doc_id") == 2L).get
    val fFil = out.find(_.getAs[String]("token") == "filter").get
    assert(fFil.getAs[Double]("score") > fJoin.getAs[Double]("score"))
  }

  test("normalize strips case/punctuation, collapses whitespace, drops stopwords") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "Make it, JOIN fast"),
      doc(2, "clean text stays")).toDF)
    val out = Text.normalize(spark, dir).collect()
    assert(out(0).getAs[String]("norm_text") == "make it fast")
    assert(out(0).getAs[Long]("n_tok_raw") == 4L && out(0).getAs[Long]("n_tok_norm") == 3L)
    assert(out(0).getAs[Long]("changed") == 1L)
    assert(out(1).getAs[String]("norm_text") == "clean text stays")
    assert(out(1).getAs[Long]("changed") == 0L)
  }

  test("unigram logprob: uniform model scores every token ln(1/2)") {
    // corpus "a a b" + "b": counts a=2, b=2, total=4 → every token's
    // log-prob is ln(0.5); both docs average to r4(ln 0.5) = -0.6931.
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a a b"), doc(2, "b")).toDF)
    val out = Text.unigramLogprob(spark, dir).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tok"), r.getAs[Double]("avg_logprob"))).toMap
    assert(byDoc == Map(1L -> ((3L, -0.6931)), 2L -> ((1L, -0.6931))))
    assert(out.forall(_.getAs[Double]("rarest_logprob") == -0.6931))
  }

  test("unigram logprob: rarer tokens score lower than common ones") {
    // "x" appears once in 8 tokens, "c" six times: lp(x) < lp(c), so the
    // doc holding the rare tokens has the lower (more negative) average.
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "c c c c c"), doc(2, "c x d")).toDF)
    val out = Text.unigramLogprob(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(out(2L) < out(1L))
  }

  test("minhash global: a cross-source duplicate forms one cluster, lowest id keeps") {
    val t = "alpha beta gamma delta epsilon"
    val dir = fixtureDir("documents" -> Seq(
      doc(1, t, source = "s0"), doc(2, t, source = "s1"),
      doc(3, "totally different content here", source = "s0")).toDF)
    val g = Dedup.minhashGlobal(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("n_xsource")))).toMap
    // cluster {1, 2} spans both sources; equal quality ties to doc 1
    assert(g("s0") == ((2L, 2L, 0L, 1L)))   // doc 1 keeps, doc 3 singleton
    assert(g("s1") == ((1L, 0L, 1L, 1L)))   // doc 2 dropped cross-source
    // contrast: the per-source pipeline cannot see the pair — everything survives
    val per = Dedup.pipelineE2e(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    assert(per("s0") == 2L && per("s1") == 1L)
  }

  test("incremental dedup tiers: exact by hash, near by standing LSH probe, else unique") {
    // batch = doc_id % 7 == 0 → docs 7, 14, 21; standing → docs 1, 2, 3
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "alpha beta gamma delta epsilon"),
      doc(2, "one two three four five six"),
      doc(3, "noise words nothing shared anywhere"),
      doc(7, "alpha beta gamma delta epsilon"),          // byte-identical to 1
      doc(14, "two one three four five six"),            // same token SET as 2
      doc(21, "entirely fresh material never seen")).toDF)
    val out = Dedup.incremental(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Long]("match_id"),
          r.getAs[Double]("best_jac")))).toMap
    assert(out(7L) == (("exact", 1L, 1.0)))
    assert(out(14L) == (("near", 2L, 1.0)))  // reordered text: hash differs, set identical
    assert(out(21L)._1 == "unique" && out(21L)._2 == -1L)
    assert(out.size == 3)                    // standing docs never re-deduped
  }

  test("bpe train: merge table over three rounds matches the hand computation") {
    // doc1 "a a a a", doc2 "a a b":
    //   r1: (a,a)=4 wins; doc1→[a_a a_a] (2 merges), doc2→[a_a b] (1)
    //   r2: (a_a,a_a) and (a_a,b) both 1 — tie breaks to t2='a_a'; 1 merge
    //   r3: (a_a,b)=1 wins; 1 merge; then no pairs remain → loop ends early
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a a a a"), doc(2, "a a b")).toDF)
    val rows = Text.bpeTrain(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(1L, 2L, 3L))
    val byRound = rows.map(r => r.getAs[Long]("round") ->
      ((r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[Long]("cnt"), r.getAs[Long]("n_merges")))).toMap
    assert(byRound(1L) == (("a", "a", 4L, 3L)))
    assert(byRound(2L) == (("a_a", "a_a", 1L, 1L)))
    assert(byRound(3L) == (("a_a", "b", 1L, 1L)))
  }

  test("bpe encode: final corpus state after an early-stopped training loop") {
    // Same corpus as the train test: training stops after round 3 (no
    // pairs remain). Encode must serve the post-round-3 state: doc1
    // collapsed to [a_a_a_a → wait, r2 merged (a_a,a_a) in doc1 →
    // [a_a_a_a]; r3 merged (a_a,b) in doc2 → [a_a_b]] — both single
    // tokens, and the early stop must NOT lose them.
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "a a a a"), doc(2, "a a b")).toDF)
    val out = Text.bpeEncode(spark, dir).collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_tok_before"), r.getAs[Long]("n_tok"),
        r.getAs[String]("encoded_text")))).toMap
    assert(byId(1L) == ((4L, 1L, "a_a_a_a")))
    assert(byId(2L) == ((3L, 1L, "a_a_b")))
  }

  test("global ngram dedup pairs a cross-source duplicate that per-source blocking misses") {
    val t = "alpha beta gamma delta epsilon zeta"
    val dir = fixtureDir("documents" -> Seq(
      doc(1, t, source = "s0"), doc(2, t, source = "s1"),
      doc(3, "unrelated words only here now", source = "s0")).toDF)
    // per-source: docs 1 and 2 never meet (different blocks), doc 3 shares
    // nothing — the per-source query sees zero candidate pairs at all.
    assert(Text.dedupNgramJaccard(spark, dir).collect().isEmpty)
    val g = Text.dedupNgramGlobal(spark, dir).collect()
    assert(g.length == 1)
    val r = g(0)
    assert(r.getAs[Long]("cross_source") == 1L)
    assert(r.getAs[Long]("n_pairs") == 1L && r.getAs[Long]("n_near") == 1L)
    assert(r.getAs[Long]("first_d1") == 1L)
    assert(r.getAs[Double]("avg_jac") == 1.0) // identical shingle sets
  }

  test("pii mask: emails, ipv4s, and phones are masked and counted") {
    val dir = fixtureDir("documents" -> Seq(doc(12, "hello plain words")).toDF)
    val r = Text.piiMask(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_ip") == 1L)
    assert(r.getAs[Long]("n_phone") == 1L)
    val m = r.getAs[String]("masked")
    assert(m.contains("<EMAIL>") && m.contains("<IP>") && m.contains("<PHONE>"))
    assert(!m.contains("@") && !m.contains("+1-555"))
    assert(!m.matches(".*[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+.*")) // 10.12.0.5 gone
    assert(r.getAs[Long]("masked_len") == m.length.toLong)
  }

  test("quality buckets: quartiles tile each lang with non-overlapping score ranges") {
    // 8 docs, one lang: doc i holds i stopwords out of 8 equal-length
    // tokens, so the composite score is strictly increasing in i.
    val dir = fixtureDir("documents" -> (1L to 8L).map { i =>
      val t = (Seq.fill(i.toInt)("join") ++ Seq.fill(8 - i.toInt)("aaaa")).mkString(" ")
      doc(i, t)
    }.toDF)
    val out = Text.qualityBuckets(spark, dir).collect()
    assert(out.map(_.getAs[Long]("quartile")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 2L, 2L, 2L))
    // strictly increasing score ⇒ adjacent quartile ranges cannot overlap
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_q") <= b.getAs[Double]("min_q"))
    }
  }

  test("domain mix: weights normalize to 1 and temperature flattens the shares") {
    val dir = fixtureDir("documents" ->
      ((1L to 9L).map(i => doc(i, "a b", source = "big")) :+
        doc(10, "a b", source = "small")).toDF)
    val out = Text.domainMix(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("p"), r.getAs[Double]("weight"),
          r.getAs[Long]("budget_per_100k")))).toMap
    val (pB, wB, qB) = out("big"); val (pS, wS, qS) = out("small")
    assert(math.abs(pB - 0.9) < 1e-9 && math.abs(pS - 0.1) < 1e-9)
    assert(math.abs(wB + wS - 1.0) < 1e-5)
    assert(wB < pB && wS > pS) // α=0.5 damps the head, boosts the tail
    assert(qB + qS <= 100000L && qB + qS >= 99998L)
  }

  test("repetition stats: duplicate-token and top-bigram fractions flag the loopy doc") {
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "spam spam spam spam"),       // dup_frac 0.75, bg 'spam spam' ×3 → 6/4 clamped to 1.0
      doc(2, "all tokens here differ ok"), // dup 0, bigrams unique → 0.4
      doc(3, "x")                          // 1 token: both fracs 0, unflagged
    ).toDF)
    val out = Text.repetitionStats(spark, dir).collect()
      .map(r => r.getAs[Boolean]("flagged") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("avg_dup_frac"),
          r.getAs[Double]("max_bg_frac")))).toMap
    assert(out(true) == ((2L, 0.375, 1.0)),
      "doc1 flagged by dup_frac; doc2 by bg_frac 0.4 > 0.2")
    assert(out(false) == ((1L, 0.0, 0.0)))
  }

  test("span merge: straddling duplicates merge into one maximal span; chunk-exact misses them") {
    // docs 1/2 share tokens 0..9 (three overlapping 8-windows at pos 0,1,2
    // in doc 1 → ONE merged span [0,10)); doc 3 shares nothing.
    val shared = "a b c d e f g h i j"
    val dir = fixtureDir("documents" -> Seq(
      doc(1, shared + " k1 l1 m1 n1 o1 p1"),
      doc(2, shared + " k2 l2 m2 n2 o2 p2"),
      doc(3, "q r s t u v w x y z q2 r2 s2 t2 u2 v2")
    ).toDF)
    val out = Text.dedupSpanMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("max_span_len")))).toMap
    assert(out.keySet == Set(1L, 2L), "only the sharing docs carry spans")
    assert(out(1L) == ((1L, 10L, 10L)), "three overlapping windows → one [0,10) span")
    assert(out(2L) == ((1L, 10L, 10L)))
  }

  test("span merge: disjoint duplicated regions stay separate islands") {
    // doc 1 vs doc 2: duplicated 8-token block, 9 unique tokens, then
    // another duplicated 8-token block → two islands of 8 tokens each.
    val b1 = "a b c d e f g h"; val b2 = "p q r s t u v w"
    val dir = fixtureDir("documents" -> Seq(
      doc(1, s"$b1 x1 x2 x3 x4 x5 x6 x7 x8 x9 $b2"),
      doc(2, s"$b1 y1 y2 y3 y4 y5 y6 y7 y8 y9 $b2")
    ).toDF)
    val out = Text.dedupSpanMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens")))).toMap
    assert(out(1L) == ((2L, 16L)), "two disjoint 8-token spans")
    assert(out(2L) == ((2L, 16L)))
  }

  test("pagerank: the star hub outranks leaves; isolated docs stay out; mass is conserved") {
    // Five exact duplicates share every band bucket → star edges from the
    // min doc_id: deg(1)=4, deg(2..5)=1. Docs 6/7 use disjoint vocab and
    // join no bucket — they must not appear.
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = fixtureDir("documents" -> Seq(
      doc(1, dup), doc(2, dup), doc(3, dup), doc(4, dup), doc(5, dup),
      doc(6, "one two three four five six seven eight"),
      doc(7, "red green blue cyan magenta yellow black white")
    ).toDF)
    val out = Dedup.graphPagerank(spark, dir).collect()
    assert(out.length == 5, "only the connected component's nodes are ranked")
    assert(out.head.getAs[Long]("doc_id") == 1L && out.head.getAs[Long]("degree") == 4L,
      "the star hub has max degree and max rank")
    assert(out.tail.forall(_.getAs[Double]("pr") < out.head.getAs[Double]("pr")))
    val total = out.map(_.getAs[Double]("pr")).sum
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass ~1 (got $total)")
  }

  test("triangles: an exact-dup clique is all-triangles; disjoint docs stay out") {
    // Docs 1-5 identical → every pair shares every band bucket → the
    // candidate graph is K5: each node has degree 4, sits in C(4,2)=6
    // triangles, coefficient exactly 1. Docs 6/7 share no bucket with
    // anything → absent from the edge set entirely.
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = fixtureDir("documents" -> Seq(
      doc(1, dup), doc(2, dup), doc(3, dup), doc(4, dup), doc(5, dup),
      doc(6, "one two three four five six seven eight"),
      doc(7, "red green blue cyan magenta yellow black white")
    ).toDF)
    val out = Dedup.graphTriangles(spark, dir).collect()
    assert(out.length == 5, "only the clique's nodes appear")
    out.foreach { r =>
      assert(r.getAs[Long]("degree") == 4L)
      assert(r.getAs[Long]("n_tri") == 6L)
      assert(r.getAs[Double]("clust_coef") == 1.0)
    }
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("zipf fit: a perfect power law fits slope -1 with r2 = 1") {
    // freq(token_r) = 64/r for ranks 1,2,4,8,...: ln f = ln 64 − ln r —
    // exact slope −1. Build by repeating tokens; single doc suffices.
    val text = (Seq.fill(64)("t1") ++ Seq.fill(32)("t2") ++ Seq.fill(16)("t3") ++
      Seq.fill(8)("t4") ++ Seq.fill(4)("t5")).mkString(" ")
    val dir = fixtureDir("documents" -> Seq(doc(1, text)).toDF)
    val r = Text.zipfFit(spark, dir).collect().head
    assert(r.getAs[Long]("n_ranks") == 5)
    // ranks 1..5 with freqs 64,32,16,8,4: ln f = ln64 − ln2·ln-rank? No —
    // freq halves per RANK STEP, not per ln(rank) unit, so the fit is not
    // exactly −1; assert the direction and high r2 instead.
    assert(r.getAs[Double]("slope") < -1.0)
    assert(r.getAs[Double]("r2") > 0.9)
  }

  test("pmi bigrams: a always-paired bigram outranks one with promiscuous parts") {
    // 'new york' occurs 3×, and those are the only uses of either token
    // → PMI = ln(3N/9); 'the end' occurs 3× but 'the' appears 9× total.
    val dir = fixtureDir("documents" -> Seq(
      doc(1, "new york the end"), doc(2, "new york the end"),
      doc(3, "new york the end"), doc(4, "the cat the dog the fish")).toDF)
    val out = Text.pmiBigrams(spark, dir).collect()
    val pmi = out.map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
      r.getAs[Double]("pmi")).toMap
    assert(pmi.contains(("new", "york")) && pmi.contains(("the", "end")))
    assert(pmi(("new", "york")) > pmi(("the", "end")))
    val n = 18.0 // total tokens
    assert(math.abs(pmi(("new", "york")) - math.floor(math.log(3 * n / 9) * 1e4 + 0.5) / 1e4) < 1e-9)
  }

  test("pack sequences: window count, boundary splits, and fill fraction are exact") {
    // one source, one shard; 100+100+100 tokens, C=256 → 2 windows;
    // doc2 spans the 256 cut (200..299), doc3 starts past it.
    val t100 = Seq.fill(100)("w").mkString(" ")
    val dir = fixtureDir("documents" -> Seq(
      doc(1, t100), doc(2, t100), doc(3, t100)).toDF)
    val r = Text.packSequences(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") == 3L && r.getAs[Long]("n_tokens") == 300L)
    assert(r.getAs[Long]("n_shards") == 1L && r.getAs[Long]("n_windows") == 2L)
    assert(r.getAs[Long]("n_split_docs") == 1L, "only doc2 crosses the cut")
    assert(r.getAs[Double]("fill_frac") == math.floor(300.0 / 512.0 * 1e4 + 0.5) / 1e4)
  }
}
