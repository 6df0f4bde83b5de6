package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the WHOLE declared surface — the
  * properties the correctness gate assumes before it runs a single
  * query. Locking them in as a spec means "a query slipped in without
  * an oracle" (the round-6 ADVICE finding) fails CI, not the round. */
class ContractSpec extends AnyFunSuite with SparkFixture {

  test("every declared query has an oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles without query: ${o.diff(q).toSeq.sorted}")
  }

  test("query names are snake_case and unique across module maps") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("[a-z][a-z0-9_]*"), s"non-snake-case query name: $n")
    }
    // Map ++ silently last-wins on duplicate keys: the combined size must
    // equal the sum of the module maps' sizes or a name collision ate one.
    val modules = Seq(
      graft.ops.PipelineOps.queries, graft.ops.Relational.queries,
      graft.ops.Scalars.queries, graft.ops.Text.queries,
      graft.ops.Vector.queries, graft.ops.Dedup.queries,
      graft.ops.StreamingModel.queries, graft.ops.Udaf.queries,
      graft.ops.SqlSurface.queries)
    assert(modules.map(_.size).sum == SparkEntry.queries.size,
      "duplicate query key across module maps (Map ++ last-wins ate one)")
  }

  test("oracle SQL never references the raw events table without the µs-cast wrapper") {
    // events.ts must be read through Util.evSql's CAST(ts AS TIMESTAMP)
    // (FIXTURES.md: raw ts values are not comparable across engines).
    // Matching "FROM events" catches the bare-table spelling; the
    // wrapper's subquery form never contains it.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.matches("(?s).*\\bFROM\\s+events\\b.*") &&
        !sql.contains("CAST(ts AS TIMESTAMP)") && sql.contains(" ts") => name
    }
    assert(offenders.isEmpty,
      s"oracles reading raw events.ts without the cast wrapper: ${offenders.toSeq.sorted}")
  }

  test("the flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md and README.md declared-query counts match the key set") {
    // The r11 341→340 drift was hand-synced twice (VERDICT r11 ask #8):
    // the docs' headline counts are now asserted against the single
    // source of truth, so adding a query without bumping both fails CI.
    val n = SparkEntry.queries.size
    def countsIn(path: String, re: scala.util.matching.Regex): Seq[Int] =
      re.findAllMatchIn(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path))).map(_.group(1).toInt).toSeq
    val survey = countsIn("SURVEY.md", """\*\*(\d+) declared queries total""".r)
    assert(survey == Seq(n),
      s"SURVEY.md headline says $survey declared queries, key set has $n")
    val readme = countsIn("README.md", """(\d+) declared queries""".r)
    assert(readme.forall(_ == n),
      s"README.md mentions counts $readme, key set has $n")
  }
}
