package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the stall-re-probe plumbing in [[Bench]] (round-9 verdict #7):
  * prior-median parsing from BENCH_TOTAL.json — including the loud-warn
  * path for malformed artifacts that used to silently disable stall
  * detection — and the suspect-threshold logic. Pure driver-side logic,
  * no SparkSession needed. */
class BenchPriorsSpec extends AnyFunSuite {

  private def tmpJson(content: String): java.io.File = {
    val f = Files.createTempFile("bench_total", ".json").toFile
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    try w.print(content) finally w.close()
    f
  }

  test("parsePriors reads the per-query median map from a well-formed artifact") {
    val f = tmpJson(
      """{"metric":"total","value":10.0,"queries":{"q1":2.5,"q2":0.75},"sf":"x"}""")
    assert(Bench.parsePriors(f) == Map("q1" -> 2.5, "q2" -> 0.75))
  }

  test("parsePriors: missing file, malformed JSON, and missing 'queries' all yield empty (never throw)") {
    assert(Bench.parsePriors(new java.io.File("/nonexistent/BENCH_TOTAL.json")).isEmpty)
    assert(Bench.parsePriors(tmpJson("{not json at all")).isEmpty)
    assert(Bench.parsePriors(tmpJson("""{"metric":"total","value":1.0}""")).isEmpty)
  }

  test("stallSuspects: doubled-median AND >1s absolute regression; sentinels and fresh queries exempt") {
    val prior = Map("slow" -> 2.0, "fast" -> 0.2, "gone" -> 3.0, "flat" -> 4.0)
    val medians = Map(
      "slow" -> 4.5,  // 2.25x and +2.5s -> suspect
      "fast" -> 0.9,  // 4.5x but only +0.7s -> jitter, exempt
      "flat" -> 4.3,  // +0.3s -> exempt
      "new" -> 9.0,   // no prior -> exempt
      "bad" -> -1.0)  // failed sentinel -> exempt
    assert(Bench.stallSuspects(medians, prior) == Seq("slow"))
    // exactly 2x is NOT a suspect (strictly greater required)
    assert(Bench.stallSuspects(Map("slow" -> 4.0), prior).isEmpty)
  }
}
