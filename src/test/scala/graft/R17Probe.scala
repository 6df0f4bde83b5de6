package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 optimization A/B harness (not a spec).
  * Run: sbt "Test/runMain graft.ops.R17Probe <group> [check|time] [dataDir]"
  * Groups: substr | novelty
  *
  * `check` collects every variant and asserts cell equality with the
  * declared spelling (run at sf0.01 first); `time` min-of-3 toRdd-forced
  * timings at the given dir (default sf0.1) plus a formatted-plan dump
  * to target/r17plans/. Mirrors the PlanDump methodology so numbers are
  * comparable with bench artifacts.
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val group = args.headOption.getOrElse("substr")
    val mode = if (args.length > 1) args(1) else "time"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"

    // warmup, same families as Bench
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try Relational.windowLagDelta(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    try Relational.joinInnerHash(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    try Text.tokenTopk(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }

    def time(label: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val d = df
      d.queryExecution.toRdd.count()
      val plan = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      new java.io.File("target/r17plans").mkdirs()
      val w = new java.io.PrintWriter(s"target/r17plans/$label.txt")
      try w.println(plan) finally w.close()
      println(f"[r17] $label%-28s min=${times.min}%6.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    def check(label: String, cur: DataFrame, alt: DataFrame): Unit = {
      val a = cur.collect().map(_.toString).sorted
      val b = alt.collect().map(_.toString).sorted
      val ok = a.sameElements(b)
      println(s"[r17] CHECK $label rows=${a.length} vs ${b.length} equal=$ok")
      if (!ok) {
        a.zip(b).zipWithIndex.filter { case ((x, y), _) => x != y }.take(3)
          .foreach { case ((x, y), i) => println(s"  diff@$i\n   cur=$x\n   alt=$y") }
        sys.exit(1)
      }
    }

    // ---- dedup_exact_substring variants -------------------------------
    val k = 24
    def gFrame(d: DataFrame): DataFrame =
      d.filter(col("n") >= k)
        .select(col("doc_id"), col("text"), col("n"),
          explode(sequence(lit(1L), col("n") - lit(k - 1L))).as("pos"))
        .select(col("doc_id"), col("pos"),
          col("text").substr(col("pos").cast("int"), lit(k)).as("h"))
    def substrOut(d: DataFrame, dup: DataFrame): DataFrame = {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val runs = dup
        .withColumn("gap", col("pos") - lag(col("pos"), 1).over(w))
        .withColumn("new_run",
          (col("gap").isNull || col("gap") > k).cast("long"))
        .withColumn("run_id", sum(col("new_run"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "run_id")
        .agg(count(lit(1)).as("ng"),
          (max(col("pos")) - min(col("pos")) + k).as("chars"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_runs"), sum(col("ng")).as("n_dup_grams"),
          sum(col("chars")).as("dup_chars"),
          max(col("chars")).as("longest_run_chars"))
      d.select(col("doc_id"), col("n").as("n_chars"),
          greatest(col("n") - lit(k - 1L), lit(0L)).as("n_grams_total"))
        .join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"), col("n_grams_total"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          coalesce(col("n_runs"), lit(0L)).as("n_runs"),
          coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
          coalesce(col("longest_run_chars"), lit(0L)).as("longest_run_chars"),
          Util.r6(coalesce(col("dup_chars"), lit(0L)).cast("double")
            / col("n_chars").cast("double")).as("dup_ratio"))
        .orderBy("doc_id")
    }
    def docsN(): DataFrame = Util.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))

    // v1: groupBy(h).count map-side partial + shuffle-hash LEFT SEMI join
    // back (no broadcast of the dup-gram set); pays a second Generate.
    def substrV1(): DataFrame = {
      val d = docsN()
      val g = gFrame(d)
      val dupH = g.groupBy("h").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2).select("h")
      val dup = g.join(dupH.hint("shuffle_hash"), Seq("h"), "left_semi")
        .select(col("doc_id"), col("pos"))
      substrOut(d, dup)
    }
    // v2: same but the gram frame is iterCheckpoint'd — ONE Generate.
    def substrV2(): DataFrame = {
      val d = docsN()
      val g = Util.iterCheckpoint(gFrame(d))
      val dupH = g.groupBy("h").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2).select("h")
      val dup = g.join(dupH.hint("shuffle_hash"), Seq("h"), "left_semi")
        .select(col("doc_id"), col("pos"))
      substrOut(d, dup)
    }
    // v3: single-pass salted two-level window — no second Generate, no
    // join against a corpus-derived frame; skew bounded at rows/64 per
    // (h, salt) and 128 rows per h in the level-2 window.
    def substrV3(): DataFrame = {
      val d = docsN()
      val salts = 64
      val g = gFrame(d)
        .withColumn("salt", pmod(xxhash64(col("doc_id"), col("pos")), lit(salts)))
      val wS = Window.partitionBy("h", "salt")
      val a = g
        .withColumn("c1", count(lit(1)).over(wS))
        .withColumn("mn", min(struct(col("doc_id"), col("pos"))).over(wS))
      val sure = a.filter(col("c1") >= 2).select(col("doc_id"), col("pos"))
      val cand = a.filter(col("c1") === 1 ||
          (col("mn.doc_id") === col("doc_id") && col("mn.pos") === col("pos")))
        .select(col("doc_id"), col("pos"), col("h"), col("c1"))
      val tot = cand.withColumn("tot",
        sum(col("c1")).over(Window.partitionBy("h")))
      val singles = tot.filter(col("c1") === 1 && col("tot") >= 2)
        .select(col("doc_id"), col("pos"))
      substrOut(d, sure.unionByName(singles))
    }

    // v4: single-lineage salted two-level window — no union, no second
    // Generate. Level 1 over (h, salt): per-bucket count c1 + bucket rep.
    // Level 2 over (h, salt2) where salt2 = -1 for "included" rows
    // (singles + one rep per multi-occupancy bucket, <= 2*salts rows per
    // gram) and the original salt otherwise (those rows are already
    // decided by c1 >= 2 and ignore tot). Every window partition is
    // bounded: level 1 at hot/salts, level 2 at 2*salts rows.
    def substrV4(): DataFrame = {
      val d = docsN()
      val salts = 64
      val g = gFrame(d)
        .withColumn("salt", pmod(xxhash64(col("doc_id"), col("pos")), lit(salts)))
      val wS = Window.partitionBy("h", "salt")
      val a = g.select(col("doc_id"), col("pos"), col("h"), col("salt"),
        count(lit(1)).over(wS).as("c1"),
        min(struct(col("doc_id"), col("pos"))).over(wS).as("mn"))
      val incl = col("c1") === 1 ||
        (col("mn.doc_id") === col("doc_id") && col("mn.pos") === col("pos"))
      val w2 = Window.partitionBy(col("h"),
        when(incl, lit(-1L)).otherwise(col("salt")))
      val tot = a.withColumn("tot",
        sum(when(incl, col("c1")).otherwise(lit(0L))).over(w2))
      val dup = tot.filter(col("c1") >= 2 || col("tot") >= 2)
        .select(col("doc_id"), col("pos"))
      substrOut(d, dup)
    }

    // v0h: the CURRENT window spelling with the partition key prefixed
    // by xxhash64(h) — same groups (hash is a function of h), but the
    // sort under WindowExec resolves on the long prefix instead of
    // 24-char string compares.
    def substrV0h(): DataFrame = {
      val d = docsN()
      val g = gFrame(d)
      val dup = g
        .withColumn("n_occ", count(lit(1)).over(
          Window.partitionBy(xxhash64(col("h")), col("h"))))
        .filter(col("n_occ") >= 2)
        .select(col("doc_id"), col("pos"))
      substrOut(d, dup)
    }
    // v5: v4 with hash-prefixed window keys on both levels.
    def substrV5(): DataFrame = {
      val d = docsN()
      val salts = 64
      val g = gFrame(d)
        .withColumn("salt", pmod(xxhash64(col("doc_id"), col("pos")), lit(salts)))
        .withColumn("hh", xxhash64(col("h")))
      val wS = Window.partitionBy(col("hh"), col("h"), col("salt"))
      val a = g.select(col("doc_id"), col("pos"), col("h"), col("hh"), col("salt"),
        count(lit(1)).over(wS).as("c1"),
        min(struct(col("doc_id"), col("pos"))).over(wS).as("mn"))
      val incl = col("c1") === 1 ||
        (col("mn.doc_id") === col("doc_id") && col("mn.pos") === col("pos"))
      val w2 = Window.partitionBy(col("hh"), col("h"),
        when(incl, lit(-1L)).otherwise(col("salt")))
      val tot = a.withColumn("tot",
        sum(when(incl, col("c1")).otherwise(lit(0L))).over(w2))
      val dup = tot.filter(col("c1") >= 2 || col("tot") >= 2)
        .select(col("doc_id"), col("pos"))
      substrOut(d, dup)
    }

    // ---- text_ngram_novelty variants ----------------------------------
    def shFrame(): DataFrame = {
      val d = Util.table(spark, dir, "documents")
      d.filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          explode(expr(
            """transform(sequence(1, size(split(text, ' ')) - 2),
               i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"""))
            .as("shingle"))
        .distinct()
    }
    // v1: owner via map-side-combinable groupBy(shingle).min + novel
    // counts via a second groupBy on the owner — per-doc totals ride a
    // third groupBy off the SAME distinct exchange; no shingle-keyed
    // window, no shingle-keyed join.
    def noveltyV1(): DataFrame = {
      val d = Util.table(spark, dir, "documents")
      val sh = shFrame()
      val perDocTotal = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val novel = sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
        .groupBy(col("first_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      val perDoc = perDocTotal.join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      val bounds = d.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      perDoc.crossJoin(broadcast(bounds))
        .withColumn("decile", least(lit(9L),
          floor((col("doc_id") - col("lo")) * 10 /
            (col("hi") - col("lo") + 1)).cast("long")))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sh")).as("n_shingles"),
          sum(col("n_novel")).as("n_novel"),
          Util.r6(sum(col("n_novel")).cast("double") /
            sum(col("n_sh")).cast("double")).as("novelty_rate"))
        .orderBy("decile")
    }

    def shRawFrame(): DataFrame = {
      val d = Util.table(spark, dir, "documents")
      d.filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          explode(expr(
            """transform(sequence(1, size(split(text, ' ')) - 2),
               i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"""))
            .as("shingle"))
    }
    // novelty v2: the owner side skips the distinct (min over duplicate
    // (doc, shingle) rows is identical) — partial min per shingle is
    // map-side combined, so the only full-frame exchange left is the
    // per-doc distinct. No shingle-keyed window, no shingle-keyed join.
    def noveltyV2(): DataFrame = {
      val d = Util.table(spark, dir, "documents")
      val raw = shRawFrame()
      val perDocTotal = raw.distinct().groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val novel = raw.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
        .groupBy(col("first_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      val perDoc = perDocTotal.join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      val bounds = d.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      perDoc.crossJoin(broadcast(bounds))
        .withColumn("decile", least(lit(9L),
          floor((col("doc_id") - col("lo")) * 10 /
            (col("hi") - col("lo") + 1)).cast("long")))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sh")).as("n_shingles"),
          sum(col("n_novel")).as("n_novel"),
          Util.r6(sum(col("n_novel")).cast("double") /
            sum(col("n_sh")).cast("double")).as("novelty_rate"))
        .orderBy("decile")
    }

    // substr over an explicit frame, current (window) spelling — for the
    // hot-gram skew soak where dir is a generated corpus.
    def substrCurOn(): DataFrame = {
      val d = docsN()
      val g = gFrame(d)
      val dup = g
        .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("n_occ") >= 2)
        .select(col("doc_id"), col("pos"))
      substrOut(d, dup)
    }

    // ---- dedup_cascade_audit cost attribution --------------------------
    def cascadeParts(): Unit = {
      val d = Util.table(spark, dir, "documents")
      def timeN(label: String)(df: => DataFrame): Unit = {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[r17] $label%-28s min=${times.min}%6.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
      // warm the corpus caches the bench's build_once label assumes
      graft.SparkEntry.queries("dedup_cascade_audit")(spark, dir)
        .queryExecution.toRdd.count()
      timeN("cascade_full")(graft.SparkEntry.queries("dedup_cascade_audit")(spark, dir))
      timeN("cascade_s1_md5agg")(
        d.groupBy(md5(lower(trim(col("text"))).cast("binary")).as("h"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id"))
      val base = d.select(col("doc_id"),
        array_distinct(split(Text.normTextExpr, " ")).as("toks"))
      timeN("cascade_base_tokenize")(base)
      timeN("cascade_verified")({
        val cg = Dedup.candGraphCached(spark, dir)
        cg.join(base.select(col("doc_id").as("d1"), col("toks").as("t1")), "d1")
          .join(base.select(col("doc_id").as("d2"), col("toks").as("t2")), "d2")
          .withColumn("inter", size(array_intersect(col("t1"), col("t2"))))
          .withColumn("jac", col("inter").cast("double")
            / (size(col("t1")) + size(col("t2")) - col("inter")).cast("double"))
          .filter(col("jac") >= 0.5)
          .select("d1", "d2")
      })
      timeN("cascade_sempairs")(Vector.semPairFrame(spark, dir))
    }

    def mapOpsV1(): DataFrame = {
      val m = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
      val entries = array_sort(map_entries(m))
      Util.table(spark, dir, "events")
        .select(
          col("event_id"),
          array_join(transform(entries, e => e.getField("key")), ",").as("keys_s"),
          array_join(transform(entries, e => e.getField("value")), ",").as("vals_s"),
          size(entries).cast("long").as("n_keys"))
        .orderBy("event_id")
    }

    // graph_betweenness_sample with fused forward layers (1+2 in one
    // checkpoint) and no d2 checkpoint — 4 eager jobs instead of 6.
    def betweennessV1(): DataFrame = {
      val e = Dedup.candGraphCached(spark, dir)
      val und = e.select(col("d1").as("u"), col("d2").as("v"))
        .unionByName(e.select(col("d2").as("u"), col("d1").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("degree"))
      val seeds = deg.orderBy(desc("degree"), col("u")).limit(3)
        .select(col("u").as("seed"))
      val lab0 = Util.iterCheckpoint(seeds
        .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"),
          lit(1L).as("sigma")))
      def next(lab: DataFrame, t: Int): DataFrame = {
        val par = lab.filter(col("dist") === t - 1)
          .select(col("seed"), col("node").as("u"), col("sigma"))
        und.join(par, "u")
          .groupBy(col("seed"), col("v").as("node"))
          .agg(sum(col("sigma")).as("sigma"))
          .join(lab, Seq("seed", "node"), "left_anti")
          .select(col("seed"), col("node"), lit(t.toLong).as("dist"),
            col("sigma"))
      }
      val lab1 = lab0.unionByName(next(lab0, 1))
      val lab2 = Util.iterCheckpoint(lab1.unionByName(next(lab1, 2)))
      val lab = Util.iterCheckpoint(lab2.unionByName(next(lab2, 3)))
      def layerDelta(parentDist: Int, childDeltas: DataFrame): DataFrame = {
        val parents = lab.filter(col("dist") === parentDist)
          .select(col("seed"), col("node").as("u"), col("sigma").as("su"))
        val children = lab.filter(col("dist") === parentDist + 1)
          .join(childDeltas, Seq("seed", "node"), "left")
          .select(col("seed"), col("node").as("v"), col("sigma").as("sw"),
            coalesce(col("delta"), lit(0L)).as("dw"))
        parents.join(und, "u").join(children, Seq("seed", "v"))
          .withColumn("term",
            expr("(2 * su * (1000000 + dw) + sw) div (2 * sw)"))
          .groupBy(col("seed"), col("u").as("node"))
          .agg(sum(col("term")).as("delta"))
      }
      val d3 = lab.filter(col("dist") === 3)
        .select(col("seed"), col("node"), lit(0L).as("delta"))
      val d2 = layerDelta(2, d3)
      val d1 = layerDelta(1, d2)
      d1.unionByName(d2)
        .groupBy(col("node").as("doc_id"))
        .agg(count(lit(1)).as("n_seeds"), sum(col("delta")).as("bc_micro"))
        .orderBy(desc("bc_micro"), col("doc_id")).limit(15)
        .select(col("doc_id"), col("n_seeds"), col("bc_micro"),
          Util.r6(col("bc_micro").cast("double") / lit(1e6)).as("betweenness"))
    }

    // text_bpe_train with checkpoints only every 2nd round (observation
    // reads deferred to the end so non-checkpoint rounds need no action
    // of their own — the next round's pair-count collect evaluates the
    // observed merge).
    def bpeStride2(): DataFrame = {
      val chain = new Util.ChainCheckpoint
      var corpus = chain(Util.table(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks")))
      def pairCounts(c: DataFrame): DataFrame =
        c.select(explode(expr(
          """zip_with(toks, slice(toks, 2, greatest(size(toks) - 1, 0)),
             (a, b) -> struct(a AS t1, b AS t2))""")).as("p"))
          .filter(col("p.t2").isNotNull)
          .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
          .agg(count(lit(1)).as("cnt"))
      val rounds = 8
      val metas = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long, org.apache.spark.sql.Observation)]()
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val bestRows = pairCounts(corpus)
          .orderBy(desc("cnt"), col("t1"), col("t2"))
          .limit(1).collect()
        if (bestRows.isEmpty) done = true
        else {
          val (t1, t2, cnt) =
            (bestRows(0).getString(0), bestRows(0).getString(1), bestRows(0).getLong(2))
          val obs = org.apache.spark.sql.Observation()
          val next = corpus.select(col("doc_id"),
              graft.functions.BpeMergeOnce.mergeOnce(col("toks"), lit(t1), lit(t2)).as("m"))
            .observe(obs, coalesce(sum(col("m.nm")), lit(0L)).as("nm"))
            .select(col("doc_id"), col("m.toks").as("toks"))
          corpus = if (r % 2 == 0 || r == rounds) chain(next) else next
          metas += ((r.toLong, t1, t2, cnt, obs))
          r += 1
        }
      }
      import spark.implicits._
      metas.map { case (rr, t1, t2, cnt, obs) =>
        (rr, t1, t2, cnt, obs.get("nm").asInstanceOf[Long])
      }.toSeq.toDF("round", "t1", "t2", "cnt", "n_merges").orderBy("round")
    }

    // ---- percentile union-hist (VERDICT #6 sf1 re-attempt) -------------
    def pBucketedHist(df: DataFrame, widthOf: org.apache.spark.sql.Column): DataFrame =
      Util.iterCheckpoint(
        df.groupBy("grp", "v").agg(count(lit(1)).as("c"))
          .withColumn("bkt", floor(col("v").cast("double") / widthOf)
            .cast("long"))
          .repartition(col("grp"), col("bkt")))
    def pGroupedCumHistOver(hist: DataFrame): DataFrame = {
      val bktPre = hist.groupBy("grp", "bkt").agg(sum(col("c")).as("bc"))
        .withColumn("pre", coalesce(sum(col("bc")).over(
          Window.partitionBy("grp").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("tot", sum(col("bc")).over(Window.partitionBy("grp")))
        .select("grp", "bkt", "pre", "tot")
      hist.join(broadcast(bktPre), Seq("grp", "bkt"))
        .withColumn("cum", col("pre") + sum(col("c")).over(
          Window.partitionBy("grp", "bkt").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    def pSelectOver(hist: DataFrame, qs: Seq[(String, Double)]): DataFrame = {
      val cum = pGroupedCumHistOver(hist)
      val aggs = qs.flatMap { case (al, q) =>
        val pos = lit(q) * (col("tot") - 1).cast("double")
        Seq(min(when(col("cum") >= floor(pos) + lit(1L), col("v")))
            .as(s"${al}_lo"),
          min(when(col("cum") >= ceil(pos) + lit(1L), col("v")))
            .as(s"${al}_hi"))
      }
      val sel = cum.groupBy("grp", "tot").agg(aggs.head, aggs.tail: _*)
        .withColumnRenamed("tot", "n")
      qs.foldLeft(sel) { case (d, (al, q)) =>
        val pos = lit(q) * (col("n") - 1).cast("double")
        val lo = floor(pos).cast("double")
        val hi = ceil(pos).cast("double")
        val vlo = col(s"${al}_lo").cast("double")
        val vhi = col(s"${al}_hi").cast("double")
        d.withColumn(al,
          when(lo === hi || col(s"${al}_lo") === col(s"${al}_hi"), vlo)
            .otherwise((hi - pos) * vlo + (pos - lo) * vhi))
      }.select(col("grp") +: col("n") +: qs.map(q => col(q._1)): _*)
    }
    // union-hist: ONE lineitem scan + ONE checkpointed composite hist
    // for both measures (2-way explode), vs two scans + two checkpoints.
    def pctlUnion(): DataFrame = {
      val li = Util.table(spark, dir, "lineitem")
      val ex = li.select(col("l_returnflag").as("rf"),
          explode(array(
            struct(lit("q").as("m"), col("l_quantity").cast("double").as("v")),
            struct(lit("p").as("m"), col("l_extendedprice").cast("double").as("v"))))
            .as("e"))
        .select(concat(col("e.m"), col("rf")).as("grp"), col("e.m").as("m"),
          col("e.v").as("v"))
      val hist = pBucketedHist(
        ex.select(col("grp"), col("v")),
        when(substring(col("grp"), 1, 1) === "q", lit(10.0)).otherwise(lit(1000.0)))
      val qty = pSelectOver(hist.filter(substring(col("grp"), 1, 1) === "q"),
        Seq(("qp50", 0.5), ("qp90", 0.9)))
        .withColumn("rf", substring(col("grp"), 2, 10)).drop("grp")
      val price = pSelectOver(hist.filter(substring(col("grp"), 1, 1) === "p"),
        Seq(("pp50", 0.5)))
        .withColumn("rf", substring(col("grp"), 2, 10)).drop("grp", "n")
      qty.join(price, "rf")
        .select(col("rf").as("l_returnflag"),
          Util.r4(col("qp50")).as("qty_p50"), Util.r4(col("qp90")).as("qty_p90"),
          Util.r4(col("pp50")).as("price_p50"), col("n"))
        .orderBy("l_returnflag")
    }

    group match {
      case "readcost" =>
        val t0 = System.nanoTime()
        (1 to 50).foreach { _ =>
          Util.table(spark, dir, "lineitem")
          Util.table(spark, dir, "documents")
          Util.table(spark, dir, "orders")
          Util.table(spark, dir, "events")
        }
        println(f"[r17] 200 table() constructions: ${(System.nanoTime()-t0)/1e9}%.2f s")
        val t1 = System.nanoTime()
        (1 to 50).foreach { _ =>
          graft.SparkEntry.queries("agg_pricing_summary")(spark, dir)
        }
        println(f"[r17] 50 query constructions (no exec): ${(System.nanoTime()-t1)/1e9}%.2f s")
      case "pctl" =>
        def curPc() = graft.SparkEntry.queries("agg_percentiles")(spark, dir)
        if (mode == "check") {
          check("pctl_union", curPc(), pctlUnion())
        } else {
          time("pctl_cur")(curPc())
          time("pctl_union")(pctlUnion())
          time("pctl_curb")(curPc())
          time("pctl_unionb")(pctlUnion())
        }
      case "bpe" =>
        def curP() = graft.SparkEntry.queries("text_bpe_train")(spark, dir)
        if (mode == "check") {
          check("bpe_stride2", curP(), bpeStride2())
        } else {
          time("bpe_cur")(curP())
          time("bpe_stride2")(bpeStride2())
          time("bpe_curb")(curP())
          time("bpe_stride2b")(bpeStride2())
        }
      case "btwn" =>
        def curB() = graft.SparkEntry.queries("graph_betweenness_sample")(spark, dir)
        curB().queryExecution.toRdd.count()  // warm candGraph cache
        if (mode == "check") {
          check("btwn_v1", curB(), betweennessV1())
        } else {
          time("btwn_cur")(curB())
          time("btwn_v1")(betweennessV1())
          time("btwn_curb")(curB())
          time("btwn_v1b")(betweennessV1())
        }
      case "mapops" =>
        def curM() = graft.SparkEntry.queries("scalar_map_ops")(spark, dir)
        if (mode == "check") {
          check("mapops_v1", curM(), mapOpsV1())
        } else {
          time("mapops_cur")(curM())
          time("mapops_v1")(mapOpsV1())
          time("mapops_curb")(curM())
          time("mapops_v1b")(mapOpsV1())
        }
      case "cascade2" =>
        val d = Util.table(spark, dir, "documents")
        graft.SparkEntry.queries("dedup_cascade_audit")(spark, dir)
          .queryExecution.toRdd.count()  // warm caches
        val cg = Dedup.candGraphCached(spark, dir)
        println(s"[r17] candGraph rows = ${cg.count()}")
        val base = d.select(col("doc_id"),
          array_distinct(split(Text.normTextExpr, " ")).as("toks"))
        def timeN(label: String)(df: => DataFrame): Unit = {
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            df.queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[r17] $label%-28s min=${times.min}%6.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
        }
        timeN("join1_only")(
          cg.join(base.select(col("doc_id").as("d1"), col("toks").as("t1")), "d1"))
        timeN("join2_no_jac")(
          cg.join(base.select(col("doc_id").as("d1"), col("toks").as("t1")), "d1")
            .join(base.select(col("doc_id").as("d2"), col("toks").as("t2")), "d2")
            .select("d1", "d2"))
        timeN("join2_jac")(
          cg.join(base.select(col("doc_id").as("d1"), col("toks").as("t1")), "d1")
            .join(base.select(col("doc_id").as("d2"), col("toks").as("t2")), "d2")
            .withColumn("inter", size(array_intersect(col("t1"), col("t2"))))
            .withColumn("jac", col("inter").cast("double")
              / (size(col("t1")) + size(col("t2")) - col("inter")).cast("double"))
            .filter(col("jac") >= 0.5)
            .select("d1", "d2"))
      case "cascade3" =>
        val d3 = Util.table(spark, dir, "documents")
        graft.SparkEntry.queries("dedup_cascade_audit")(spark, dir)
          .queryExecution.toRdd.count()  // warm caches
        val cg3 = Dedup.candGraphCached(spark, dir)
        val baseU = d3.select(col("doc_id"),
          array_distinct(split(Text.normTextExpr, " ")).as("toks"))
        val baseS = d3.select(col("doc_id"),
          array_sort(array_distinct(split(Text.normTextExpr, " "))).as("toks"))
        def verifiedOf(b: DataFrame, inter: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): DataFrame =
          cg3.join(b.select(col("doc_id").as("d1"), col("toks").as("t1")), "d1")
            .join(b.select(col("doc_id").as("d2"), col("toks").as("t2")), "d2")
            .withColumn("inter", inter(col("t1"), col("t2")))
            .withColumn("jac", col("inter").cast("double")
              / (size(col("t1")) + size(col("t2")) - col("inter")).cast("double"))
            .filter(col("jac") >= 0.5)
            .select("d1", "d2")
        if (mode == "check") {
          check("verified_sorted",
            verifiedOf(baseU, (x, y) => size(array_intersect(x, y)).cast("long")),
            verifiedOf(baseS, (x, y) =>
              graft.functions.SortedIntersectCount.sortedIntersect(x, y)))
        } else {
          time("verified_cur")(verifiedOf(baseU,
            (x, y) => size(array_intersect(x, y)).cast("long")))
          time("verified_sorted")(verifiedOf(baseS, (x, y) =>
            graft.functions.SortedIntersectCount.sortedIntersect(x, y)))
          time("verified_curb")(verifiedOf(baseU,
            (x, y) => size(array_intersect(x, y)).cast("long")))
          time("verified_sortedb")(verifiedOf(baseS, (x, y) =>
            graft.functions.SortedIntersectCount.sortedIntersect(x, y)))
        }
      case "cascade" =>
        cascadeParts()
      case "skewgen" =>
        // boilerplate-pathology corpus: one 24-char gram owns ~83% of all
        // gram rows (4k docs x 1000-char single-char run), the rest is
        // unique filler — the shape dedup_exact_substring exists to find.
        import spark.implicits._
        val nHot = sys.env.getOrElse("R17_HOT", "4000").toInt
        val nCold = sys.env.getOrElse("R17_COLD", "4000").toInt
        val hot = (1 to nHot).map { i =>
          (i.toLong, f"doc$i%07d " + ("a" * 1000))
        }
        val rnd = new scala.util.Random(42)
        val cold = (nHot + 1 to nHot + nCold).map { i =>
          (i.toLong, (1 to 120).map(_ => f"${rnd.nextLong()}%016x").mkString(" "))
        }
        (hot ++ cold).toDF("doc_id", "text").repartition(8)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        println(s"[r17] skew corpus written to $dir")
      case "substr" =>
        def cur() = graft.SparkEntry.queries("dedup_exact_substring")(spark, dir)
        if (mode == "check") {
          check("substr_v1", cur(), substrV1())
          check("substr_v2", cur(), substrV2())
          check("substr_v3", cur(), substrV3())
          check("substr_v4", cur(), substrV4())
        } else {
          time("substr_cur")(cur())
          time("substr_v1")(substrV1())
          time("substr_v2")(substrV2())
          time("substr_v3")(substrV3())
          time("substr_v4")(substrV4())
        }
      case "substr3" =>
        def cur3() = graft.SparkEntry.queries("dedup_exact_substring")(spark, dir)
        if (mode == "check") {
          check("substr_v0h", cur3(), substrV0h())
          check("substr_v5", cur3(), substrV5())
        } else {
          time("substr_v0h")(substrV0h())
          time("substr_v5")(substrV5())
          time("substr_cur")(cur3())
          time("substr_v0hb")(substrV0h())
          time("substr_v5b")(substrV5())
          time("substr_curb")(cur3())
        }
      case "skewtime" =>
        check("skew_equal", substrCurOn(), substrV4())
        time("skew_window_cur")(substrCurOn())
        time("skew_v4")(substrV4())
        time("skew_window_curb")(substrCurOn())
        time("skew_v4b")(substrV4())
      case "substr2" =>
        def cur2() = graft.SparkEntry.queries("dedup_exact_substring")(spark, dir)
        time("substr_v4")(substrV4())
        time("substr_cur")(cur2())
        time("substr_v4b")(substrV4())
        time("substr_curb")(cur2())
      case "novelty" =>
        def cur() = graft.SparkEntry.queries("text_ngram_novelty")(spark, dir)
        if (mode == "check") {
          check("novelty_v1", cur(), noveltyV1())
          check("novelty_v2", cur(), noveltyV2())
        } else {
          time("novelty_cur")(cur())
          time("novelty_v1")(noveltyV1())
          time("novelty_v2")(noveltyV2())
          time("novelty_curb")(cur())
          time("novelty_v2b")(noveltyV2())
        }
      case other => println(s"[r17] unknown group: $other")
    }
    spark.stop()
  }
}
