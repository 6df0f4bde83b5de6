package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Udaf
import graft.ops.Udaf.MGBuf

/** Misra–Gries sketch guarantees, checked on the raw Aggregator (no Spark
  * needed for the state machine) plus one end-to-end exact-regime query.
  * The declared `agg_heavy_hitters` runs only in the exact regime; these
  * tests cover the approximate regime the oracle can't. */
class UdafSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def runStream(mg: Udaf.MisraGries, toks: Seq[String], splits: Int): Map[String, Long] = {
    // fold each partition independently, then merge — the distributed shape
    val parts = toks.grouped(math.max(1, toks.size / splits)).toSeq
    val bufs = parts.map(_.foldLeft(mg.zero)(mg.reduce))
    mg.finish(bufs.reduce(mg.merge))
  }

  test("exact regime: distinct <= k reproduces exact counts under any split") {
    val mg = new Udaf.MisraGries(8)
    val toks = Seq.fill(50)(Seq("a", "b", "b", "c", "c", "c")).flatten
    val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for (splits <- Seq(1, 3, 7)) assert(runStream(mg, toks, splits) == truth)
  }

  test("approximate regime: undercount bounded by n/k, big hitters always survive") {
    val k = 4
    val mg = new Udaf.MisraGries(k)
    // zipf-ish: token i appears 2^(10-i) times, 20 distinct > k
    val toks = new scala.util.Random(42).shuffle(
      (0 until 20).flatMap(i => Seq.fill(math.max(1, 1 << math.max(0, 10 - i)))(s"t$i")))
    val n = toks.size
    val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for (splits <- Seq(1, 5)) {
      val est = runStream(mg, toks, splits)
      assert(est.size <= k, "state exceeded k entries")
      est.foreach { case (t, e) =>
        assert(e <= truth(t), s"$t overestimated: $e > ${truth(t)}")
      }
      truth.foreach { case (t, c) =>
        val e = est.getOrElse(t, 0L)
        assert(c - e <= n.toDouble / k, s"$t undercounted past n/k: $c - $e")
        if (c > n.toDouble / k) assert(est.contains(t), s"heavy hitter $t evicted")
      }
    }
  }

  test("merge truncates to k keeping the largest survivors") {
    val mg = new Udaf.MisraGries(2)
    val merged = mg.merge(MGBuf(Map("a" -> 100L, "b" -> 10L)), MGBuf(Map("c" -> 50L, "d" -> 3L)))
    assert(merged.m.keySet == Set("a", "c"))
    assert(merged.m("a") == 90L && merged.m("c") == 40L) // cut = 3rd largest (10)
  }

  test("end-to-end exact regime: declared query equals plain counts") {
    val dir = fixtureDir("documents" -> Seq(
      DocRow(1, "x y x z", "en", "s0", 7),
      DocRow(2, "y x w w", "en", "s0", 7),
      DocRow(3, "q q q r", "de", "s0", 7)).toDF)
    val out = Udaf.heavyHitters(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("token")) -> r.getAs[Long]("est_n"))
      .toMap
    assert(out == Map(
      ("en", "x") -> 3L, ("en", "y") -> 2L, ("en", "w") -> 2L, ("en", "z") -> 1L,
      ("de", "q") -> 3L, ("de", "r") -> 1L))
  }

  test("MinKLongs equals sorted-distinct-take(k) on random inputs, any partitioning") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val k = Seq(1, 3, 8, 64)(trial - 1)
      val xs = Seq.fill(300)(rnd.nextInt(80).toLong)
      val expected = xs.distinct.sorted.take(k)
      // raw state machine across an arbitrary partition split
      val agg = new Udaf.MinKLongs(k)
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"trial=$trial k=$k")
      // overflow marker: k = cap+1 proves membership exceeded cap
      val cap = 5
      val agg2 = new Udaf.MinKLongs(cap + 1)
      val out = agg2.finish(xs.foldLeft(agg2.zero)(agg2.reduce))
      assert((out.length == cap + 1) == (xs.distinct.length > cap))
    }
  }

  test("MinKLongs through the Spark UDAF path matches collect_set truncation") {
    import org.apache.spark.sql.functions._
    val minK = udaf(new Udaf.MinKLongs(3))
    val df = Seq((1L, 5L), (1L, 2L), (1L, 9L), (1L, 2L), (1L, 1L), (2L, 7L))
      .toDF("g", "x")
    val out = df.groupBy("g").agg(minK(col("x")).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(out(1L) == List(1L, 2L, 5L))
    assert(out(2L) == List(7L))
  }

  test("native MinKLongsAgg buffer equals sorted-distinct-take(k) under any split + serde") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val k = Seq(1, 3, 7, 64, 256)(trial - 1)
      val xs = Seq.fill(500)(rnd.nextLong() % 200)
      val expected = xs.distinct.sorted.take(k)
      val agg = graft.functions.MinKLongsAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
      // fold each split into its own buffer, round-trip through serde
      // (the shuffle boundary), then merge in shuffled order
      val splits = xs.grouped(math.max(1, xs.size / (trial + 1))).toSeq
      val bufs = splits.map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach(b.insert)
        agg.deserialize(agg.serialize(b))
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) => agg.merge(a, b) }
      val out = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
      assert(out == expected, s"trial=$trial k=$k")
    }
  }

  test("native MinKLongsAgg through the DataFrame path matches the UDAF twin") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000).select(
      (col("id") % 7).as("g"), pmod(col("id") * 37, lit(100)).as("x"))
      .repartition(5)
    val native = df.groupBy("g")
      .agg(graft.functions.MinKLongsAgg.minKLongs(col("x"), 9).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val minK = udaf(new Udaf.MinKLongs(9))
    val viaUdaf = df.groupBy("g").agg(minK(col("x")).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(native == viaUdaf)
  }

  test("LongVecSumAgg equals the explode/groupBy element-wise sum, any partitioning") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000)
      .select(expr(
        "transform(sequence(0, 4), k -> (id * 31 + k * 7) % 1000 - 500) AS v"))
      .repartition(7)
    val native = df
      .agg(graft.functions.LongVecSumAgg.longVecSum(col("v")).as("s"))
      .collect()(0).getSeq[Long](0).toList
    val model = df.select(posexplode(col("v")).as(Seq("k", "x")))
      .groupBy("k").agg(sum(col("x")).as("s")).orderBy("k")
      .collect().map(_.getLong(1)).toList
    assert(native == model)
    // empty input -> null (no width fixed)
    val empty = spark.range(0).select(expr("array(id) AS v"))
      .agg(graft.functions.LongVecSumAgg.longVecSum(col("v")).as("s"))
      .collect()(0)
    assert(empty.isNullAt(0))
  }

  test("SortedPairs expression equals the flatten/transform lambda spelling") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      Tuple1(Seq(1L, 2L, 3L, 4L)), Tuple1(Seq(10L, 20L)), Tuple1(Seq(5L)),
      Tuple1(Seq.empty[Long])).toDF("ds")
    val native = df.select(graft.functions.SortedPairs.pairs(col("ds")).as("p"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1))).toList)
    val lambda = df.select(expr("""flatten(transform(ds, (x, i) ->
        transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))""").as("p"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1))).toList)
    assert(native.toSeq == lambda.toSeq)
    assert(native(0) == List((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }
}
