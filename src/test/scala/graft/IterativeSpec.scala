package graft

import graft.queries.Extras

/** Pins the HOF-recurrence form of the compound index to the native
  * RECURSIVE CTE (UnionLoop) twin: identical rows bit-for-bit, so the
  * fast form in the queries map provably computes the same per-step
  * money-rounded recursion the oracle replays in DuckDB. */
class IterativeSpec extends SparkSpec {

  test("compoundIndex HOF form equals the native recursive-CTE form bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val hof = Extras.compoundIndex(spark, dir).collect().toSeq
    val rec = Extras.compoundIndexRecursive(spark, dir).collect().toSeq
    assert(hof.nonEmpty)
    assert(hof == rec)
  }
}
