package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Vector

class VectorSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def emb(id: Long, v: Array[Float], label: Int = 0) = EmbRow(id, v, label)
  private val e1 = Array(1f, 0f, 0f, 0f)
  private val e2 = Array(0f, 1f, 0f, 0f)

  test("brute-force top-k: cosine hits 1.0 for identical, 0 for orthogonal, -1 for opposite") {
    val dir = fixtureDir("embeddings" -> Seq(
      emb(0, e1), emb(1, e1), emb(2, e2), emb(3, e1.map(-_))).toDF)
    val rows = Vector.simsearchTopk(spark, dir).collect()
    val forProbe0 = rows.filter(_.getAs[Long]("probe_id") == 0)
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos")).toMap
    assert(forProbe0(1L) == 1.0 && forProbe0(2L) == 0.0 && forProbe0(3L) == -1.0)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0))
  }

  test("top-k ranking is cos desc with vec_id tie-break") {
    val dir = fixtureDir("embeddings" -> Seq(
      emb(0, e1), emb(1, e1), emb(2, e1), emb(3, e2)).toDF)
    val p0 = Vector.simsearchTopk(spark, dir).collect()
      .filter(_.getAs[Long]("probe_id") == 0).map(_.getAs[Long]("neighbor_id"))
    assert(p0.take(2).toSeq == Seq(1L, 2L)) // both cos 1.0 → id asc
  }

  test("LSH bucket excludes opposite-sign vectors, keeps same-bucket ones") {
    // 8-dim so the SRP bucket consumes real sign structure
    val a = Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)
    val dir = fixtureDir("embeddings" -> Seq(
      emb(0, a), emb(1, a.map(_ * 2)), emb(2, a.map(-_))).toDF)
    val out = Vector.simsearchLsh(spark, dir).collect()
    val n0 = out.filter(_.getAs[Long]("probe_id") == 0).map(_.getAs[Long]("neighbor_id")).toSet
    assert(n0 == Set(1L)) // 2 is in the opposite bucket — never a candidate
  }

  test("LSH candidates are a subset of brute-force candidates with equal scores") {
    val dir = fixtureDir("embeddings" ->
      (0L until 6L).map(i => emb(i, Array.tabulate(8)(j => ((i + j) % 3 - 1).toFloat + 0.5f))).toDF)
    val brute = Vector.simsearchTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cos")).toMap
    val lsh = Vector.simsearchLsh(spark, dir).collect()
    lsh.foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos")))
    }
  }

  test("LSH multi-probe candidates are a superset of single-probe candidates") {
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val single = pairs(Vector.simsearchLsh(spark, dir))
    val multi = pairs(Vector.simsearchLshMultiprobe(spark, dir))
    // both rank top-3 per probe; the multi-probe candidate pool is a
    // superset, so its kept neighbors must score >= the single-probe ones —
    // verify set-level: every probe keeps at least as many neighbors and
    // each dropped single-probe neighbor was displaced by a better one
    val brute = Vector.simsearchTopk(spark, dir).collect()
      .filter(_.getAs[Long]("rk") <= 3)
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert((multi & brute).size >= (single & brute).size,
      s"multi-probe recall ${(multi & brute).size} below single-probe ${(single & brute).size}")
    assert(multi.size >= single.size)
  }

  test("IVF multi-probe: recall vs exact top-3 strictly improves over single-probe") {
    // Real sf0.001 corpus: 16 trained cells over the embeddings table.
    // Recall@3 against the exact brute-force neighbors; searching the
    // nearest 2 cells must recover neighbors single-probe loses across
    // Voronoi boundaries.
    val dir = "/root/testdata/sf0.001"
    val brute = Vector.simsearchTopk(spark, dir).collect()
      .filter(_.getAs[Long]("rk") <= 3)
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    def recall(nprobe: Int): Double = {
      val got = Vector.ivfSearch(spark, dir, nprobe).collect()
        .groupBy(_.getAs[Long]("probe_id"))
        .map { case (p, rs) => p -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      val hit = brute.map { case (p, b) => (b & got.getOrElse(p, Set.empty[Long])).size }.sum
      hit.toDouble / brute.map(_._2.size).sum
    }
    val single = recall(1)
    val multi = recall(2)
    info(s"recall@3 single-probe=$single multi-probe=$multi")
    assert(multi > single,
      s"multi-probe recall $multi does not improve on single-probe $single")
  }

  test("int8 quantization: values bounded, max-abs element hits ±127, error small") {
    val dir = fixtureDir("embeddings" -> Seq(
      emb(0, Array(0.5f, -1.0f, 0.25f, 0.125f))).toDF)
    val r = Vector.embeddingQuantize(spark, dir).collect()(0)
    // scale = 127/1.0; q = [64, -127, 32, 16]
    assert(r.getAs[String]("q_head8") == "64,-127,32,16")
    assert(r.getAs[Double]("q_scale") == 127.0)
    assert(r.getAs[Long]("dim") == 4L)
    assert(r.getAs[Double]("rms_err") < 0.005)   // within half a quantization step
  }

  test("range search keeps only pairs at or above the cosine threshold") {
    def basis(i: Int, scale: Float = 1f): Array[Float] = {
      val a = Array.fill(8)(0f); a(i) = scale; a
    }
    // vecs 1–5 are orthogonal unit basis vectors (all five become probes,
    // pairwise cosine 0 — below threshold); vec 100 is a scaled copy of
    // vec 1 (cosine exactly 1.0). Exactly one qualifying pair must remain.
    val dir = fixtureDir("embeddings" -> (
      (1 to 5).map(i => emb(i.toLong, basis(i - 1))) :+ emb(100L, basis(0, 2f))).toDF)
    val out = Vector.simsearchRange(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("probe_id") == 1L)
    assert(out(0).getAs[Long]("neighbor_id") == 100L)
    assert(out(0).getAs[Double]("cos") == 1.0)
  }

  test("bucketed embedding dedup: on a fixture WITH true near-dups, bucketed top-3 == all-pairs top-3") {
    // The production fixture has no real near-dups (max intra-label cos
    // ≈ 0.48), where SRP bucketing legitimately prunes low-cos pairs; on
    // a corpus with ACTUAL duplicates (cos ≈ 1) the perturbed twin lands
    // in the same or a Hamming-1 bucket with overwhelming probability,
    // so the bucketed candidate generation must recover exactly the
    // all-pairs answer. This is the ground-truth check the declared
    // replayed-generation oracle can't express.
    val rnd = new scala.util.Random(3)
    def randv(d: Int): Array[Float] = Array.fill(d)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
    val bases = (0 until 5).map(_ => randv(16))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq(emb(i * 2L, b), emb(i * 2L + 1, perturb(b)))
    } ++ (0 until 10).map(i => emb(100L + i, randv(16)))
    val dir = fixtureDir("embeddings" -> rows.toDF)
    val out = Vector.dedupEmbedding(spark, dir).collect()
    val got = out.map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2"))).toSet
    val truePairs = (0 until 5).map(i => (i * 2L, i * 2L + 1L)).toSet
    assert(out.length == 3, s"expected top-3 rows, got ${out.length}")
    assert(got.subsetOf(truePairs),
      s"bucketed top-3 includes a non-duplicate pair: $got")
    out.foreach(r => assert(r.getAs[Double]("cos") > 0.95))
  }

  test("PQ ADC: a near-identical twin survives compressed-domain search and re-ranks first") {
    // The twin's codes are the nearest centroids to the probe's own
    // subvectors, so its ADC distance is just quantization error — far
    // below any random vector's true distance. It must make the ADC
    // top-5 and take rank 1 after exact re-rank.
    val rnd = new scala.util.Random(11)
    def randv() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val vs = (0 until 30).map(i => emb(i.toLong, randv()))
    val twin = emb(100L,
      vs(0).embedding.map(x => x + (rnd.nextGaussian() * 0.005).toFloat))
    val dir = fixtureDir("embeddings" -> (vs :+ twin).toDF)
    val out = Vector.simsearchPq(spark, dir).collect()
    val p0 = out.filter(_.getAs[Long]("probe_id") == 0L)
    assert(p0.nonEmpty && p0.head.getAs[Long]("neighbor_id") == 100L,
      s"twin not rank-1 for probe 0: ${p0.map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSeq}")
    assert(p0.head.getAs[Double]("cos") > 0.99)
  }

  test("global embedding dedup pairs a cross-label twin that label blocking misses") {
    // 16-dim so the 16-bit SRP bucket consumes every sign; vec 1 is a
    // scaled copy of vec 0 under a DIFFERENT label (cos = 1.0, same
    // bucket); vec 2 is sign-opposite (never a candidate).
    val base = Array.tabulate(16)(j => if (j % 3 == 0) 1f else -1f)
    val dir = fixtureDir("embeddings" -> Seq(
      emb(0, base, label = 0), emb(1, base.map(_ * 2f), label = 1),
      emb(2, base.map(-_), label = 0)).toDF)
    val g = Vector.dedupEmbeddingGlobal(spark, dir).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("v1") == 0L && g(0).getAs[Long]("v2") == 1L)
    assert(g(0).getAs[Long]("cross_label") == 1L)
    assert(g(0).getAs[Double]("cos") == 1.0)
    // the label-blocked operator cannot see the pair
    val per = Vector.dedupEmbedding(spark, dir).collect()
    assert(!per.exists(r => r.getAs[Long]("v1") == 0L && r.getAs[Long]("v2") == 1L))
  }

  test("kmeans assign: every vector lands on its true nearest centroid, ties to lowest id") {
    // 12 vectors, centroids = ids 0..7; vec 11's values repeat vec 0's
    // exactly ((i*7+3j) mod 11 has period 11 in i), so it must assign to
    // centroid 0 at distance 0 — the duplicate-row tie case.
    val vecs = (0L to 11L).map(i =>
      emb(i, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat - 5f)))
    val dir = fixtureDir("embeddings" -> vecs.toDF)
    val out = Vector.clusterKmeansAssign(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("centroid_id"), r.getAs[Double]("sqd")))).toMap
    def sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
    vecs.foreach { v =>
      val exp = (0 until 8).map(c => (sq(v.embedding, vecs(c).embedding), c.toLong)).min
      assert(out(v.vec_id)._1 == exp._2,
        s"vec ${v.vec_id}: got centroid ${out(v.vec_id)._1}, want ${exp._2}")
    }
    (0L until 8L).foreach(c => assert(out(c) == ((c, 0.0)), s"centroid $c self-assign"))
    assert(out(11L) == ((0L, 0.0)))
  }

  test("multimodal binary meta: byte length and md5 match the utf8 payload") {
    val dir = fixtureDir("documents" -> Seq(DocRow(1, "abc", "en", "s0", 3)).toDF)
    val r = Vector.multimodalBinaryMeta(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_bytes") == 3)
    assert(r.getAs[String]("content_md5") == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("semdedup: a near-copy lands in its original's cluster and only it is removed") {
    // ids 1–8 seed the centroids (each its own singleton cluster);
    // id 9 ≈ id 1 (cos ≈ 0.9939 ≥ τ) joins cluster 1 and is pruned as
    // the higher-id member; every other cluster stays an untouched
    // singleton with zero pairs and a null first_removed.
    val dir = fixtureDir("embeddings" -> Seq(
      EmbRow(1, Array(1f, 0f, 0f, 0f), 0), EmbRow(2, Array(0f, 1f, 0f, 0f), 0),
      EmbRow(3, Array(0f, 0f, 1f, 0f), 0), EmbRow(4, Array(0f, 0f, 0f, 1f), 0),
      EmbRow(5, Array(1f, 1f, 0f, 0f), 0), EmbRow(6, Array(0f, 1f, 1f, 0f), 0),
      EmbRow(7, Array(0f, 0f, 1f, 1f), 0), EmbRow(8, Array(1f, 0f, 0f, 1f), 0),
      EmbRow(9, Array(0.9f, 0.1f, 0f, 0f), 0)).toDF)
    val out = Vector.clusterSemdedup(spark, dir).collect()
      .map(r => r.getAs[Long]("cl") -> r).toMap
    val c1 = out(1L)
    assert(c1.getAs[Long]("n_members") == 2 && c1.getAs[Long]("n_pairs") == 1)
    assert(c1.getAs[Long]("n_dup_pairs") == 1 && c1.getAs[Long]("n_removed") == 1)
    assert(c1.getAs[Long]("n_kept") == 1 && c1.getAs[Long]("first_removed") == 9L)
    assert(math.abs(c1.getAs[Double]("max_cos") - 0.9939) < 1e-9)
    (2L to 8L).foreach { c =>
      assert(out(c).getAs[Long]("n_members") == 1 && out(c).getAs[Long]("n_pairs") == 0)
      assert(out(c).getAs[Long]("n_kept") == 1 && out(c).isNullAt(out(c).fieldIndex("first_removed")))
    }
  }
}
