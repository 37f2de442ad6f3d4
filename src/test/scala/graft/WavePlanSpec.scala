package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards for the round-10 analytics wave — the scale
  * claims each operator's scaladoc makes, pinned so a refactor that
  * silently reintroduces a shuffle/join/window shows up as a red
  * test, not a 100 TB incident. */
class WavePlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  // formatted mode prints each operator in the tree AND once as a
  // numbered details header "(N) Op" — count the headers
  private def nOps(p: String, op: String): Int =
    s"""\\(\\d+\\) $op""".r.findAllIn(p).length

  test("q127 collocations: the corpus never shuffles into a join (broadcast-only joins)") {
    val p = plan("q127_collocations")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    assert(nOps(p, "Generate") >= 1) // the narrow within-row bigram build
  }

  test("q134 co-occurrence: zero join nodes, one aggregate exchange over generated pairs") {
    val p = plan("q134_cooccurrence")
    assert(nOps(p, "\\w*Join") == 0)
    assert(nOps(p, "Exchange") == 1)
  }

  test("q129 funnel: one exchange, no window operator") {
    val p = plan("q129_funnel")
    assert(nOps(p, "Exchange") == 1)
    assert(nOps(p, "Window") == 0)
  }

  test("q131 cohort retention: one corpus exchange plus the skinny rollup, no join") {
    val p = plan("q131_cohort_retention")
    assert(nOps(p, "Exchange") == 2)
    assert(nOps(p, "\\w*Join") == 0)
  }

  test("q132 session transitions: both windows share one exchange") {
    val p = plan("q132_session_transitions")
    // per-user window exchange + final (from, to) count exchange —
    // a per-session re-window would add a third
    assert(nOps(p, "Exchange") == 2)
  }

  test("q133 RRF final cut runs on the bounded heap, not a window") {
    val p = plan("q133_rrf_fusion")
    assert(nOps(p, "Window") == 0)
  }

  test("q130 inverted index: two exchanges, no join") {
    val p = plan("q130_inverted_index")
    assert(nOps(p, "Exchange") == 2)
    assert(nOps(p, "\\w*Join") == 0)
  }
}
