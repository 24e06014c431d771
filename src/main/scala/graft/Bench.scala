package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: steady-state per-query timings on SPARK_GRAFT_SF_DIR.
  *
  * Each query is timed over `SPARK_GRAFT_BENCH_PASSES` (default 3) passes
  * and the MEDIAN is reported — single-pass numbers proved unstable (r01:
  * 86.6s driver vs 28.9s steady-state for identical code). The JSON line
  * keeps the driver contract shape; per-query min/max spread goes to
  * stderr so the stdout line stays a single parseable JSON object.
  *
  * Failure handling (VERDICT r2 #9 + advisor): a throwing query records a
  * `-1` sentinel median (never a flattering ~0s), is listed under
  * `"failed"`, and the process exits nonzero. The JSON line is printed
  * AFTER the per-query stderr block and duplicated to `BENCH_TOTAL.json`
  * so a truncated log tail still yields a parseable total.
  */
object Bench {

  /** Prior-round medians from a BENCH_TOTAL.json, for stall re-probing.
    * A malformed artifact must NOT silently disable stall detection
    * (round-9 verdict #7): parse failures warn loudly and return empty.
    * Factored out of main so the parse + threshold logic is unit-testable. */
  private[graft] def parsePriors(f: java.io.File): Map[String, Double] =
    if (!f.exists) Map.empty
    else try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val q = if (node == null) null else node.get("queries")
      if (q == null) {
        System.err.println(
          s"[bench] WARN: ${f.getPath} has no 'queries' field — stall re-probing disabled this run")
        Map.empty
      } else {
        val it = q.fields()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
        b.result()
      }
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] WARN: could not parse ${f.getPath} (${e.getClass.getSimpleName}: ${e.getMessage}) — stall re-probing disabled this run")
        Map.empty
    }

  /** A query is a stall SUSPECT when its fresh median at least doubles its
    * committed prior AND the absolute regression exceeds 1 s (sub-second
    * queries double inside normal host jitter). Failed queries (-1
    * sentinels) and queries without a prior are never suspects. */
  private[graft] def stallSuspects(medians: Map[String, Double],
      prior: Map[String, Double]): Seq[String] =
    medians.collect {
      case (k, v) if v > 0 &&
        prior.get(k).exists(p => p > 0 && v > 2 * p && v - p > 1.0) => k
    }.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    // optional comma-separated name filter for targeted probes while
    // iterating (the driver never sets it — full set by default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    def selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val spark = Sessions.localTune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // measurement-environment echo (BASELINE.md attribution protocol):
    // heap + shuffle-compression state explain run-to-run bands better
    // than any per-query number
    System.err.println(s"[bench] heap=${Runtime.getRuntime.maxMemory / (1 << 20)}MiB " +
      s"shuffleCompress=${spark.conf.get("spark.shuffle.compress", "?")} " +
      s"cpus=$cpus passes=$passes")
    // steady-state measurement: one untimed pass warms OS file cache,
    // parquet footers, JIT and whole-stage-codegen compilation; data
    // caches created by queries are dropped so the timed passes still do
    // the real work
    Tables.names.foreach { n =>
      try Tables.read(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    selected.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // Per-query isolation (round-4 finding: four queries regressed ≥2×
    // with zero code change once the set hit 91 queries) — mechanism in
    // Sessions.releaseAll, pinned by SessionsSpec. Called between timed
    // units so cleanup is charged to the gap, not the next query's timer.
    def isolate(): Unit = Sessions.releaseAll(spark)
    isolate()
    val results = selected.map { case (name, fn) =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        // a failing query must be LOUD — a NaN pass poisons the median
        // into the -1 sentinel instead of flattering the total
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
              false
          }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
        // isolate BETWEEN passes too: queries that persist() internally
        // must re-do their real work every timed pass, or the "median"
        // measures pass 1 cold and passes 2..N warm-cache
        isolate()
        dt
      }.sorted
      name -> times
    }
    // lower-middle element for even pass counts — never the max; any
    // failed pass makes the whole query a -1 sentinel
    def median(ts: Seq[Double]): Double =
      if (ts.exists(_.isNaN)) -1.0 else ts((ts.size - 1) / 2)
    results.foreach { case (name, ts) =>
      System.err.println(f"[bench] $name%-28s median=${median(ts)}%8.3fs min=${ts.head}%8.3fs max=${ts.last}%8.3fs")
    }
    val medians = results.map { case (k, ts) => k -> median(ts) }
    val failed = medians.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    // Stall attribution IN the artifact (round-8 verdict #1): a query
    // whose fresh median at least doubles its committed prior-round
    // median gets ONE extra isolated re-probe, recorded next to the
    // official median — a host stall then shows up as a re-probe far
    // below the median instead of living only in prose. Priors come
    // from the tracked BENCH_TOTAL.json in the working directory.
    val prior = parsePriors(new java.io.File("BENCH_TOTAL.json"))
    val suspects = stallSuspects(medians.toMap, prior)
    val reprobes = suspects.flatMap { name =>
      selected.get(name).map { fn =>
        isolate()
        val t0 = System.nanoTime()
        val dt =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        System.err.println(f"[bench] REPROBE $name%-20s median=${medians(name)}%8.3fs " +
          f"prior=${prior(name)}%8.3fs isolated=$dt%8.3fs")
        isolate()
        name -> dt
      }
    }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val reprobeJson = reprobes.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = medians.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // run provenance (round-8 ADVICE #2): the artifact itself records
    // who/when/under what JVM shape the medians were taken, so two
    // tracked totals for one round can never again be ambiguous
    // recorder attribution: the builder's own runs set
    // SPARK_GRAFT_RECORDER=builder; unset means the run was NOT started by
    // the builder — i.e. the driver's contractual recording — so the
    // default stamps that plus the OS user instead of "unspecified"
    // (round-9 verdict #4: the artifact itself must say whose numbers
    // these are)
    val recorder = sys.env.getOrElse("SPARK_GRAFT_RECORDER",
      "driver-or-unset-" + sys.props.getOrElse("user.name", "unknown"))
    val env =
      s"""{"recorded_at":"${java.time.Instant.now()}","heap_mib":${Runtime.getRuntime.maxMemory / (1 << 20)},"cpus":$cpus,"passes":$passes,"recorded_by":"$recorder"}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reprobe":$reprobeJson,"env":$env,"failed":$failedJson,"sf":"$sfDir"}"""
    // The full per-query line exceeds a 2000-char log tail at ~65+ queries
    // (BENCH_r03 recorded parsed:null for exactly this reason), so the
    // LAST stdout line is a compact total that always fits the tail; the
    // full per-query map goes to stdout above it and to BENCH_TOTAL.json.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${medians.size},"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    try {
      val w = new java.io.PrintWriter("BENCH_TOTAL.json")
      try w.println(line) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_TOTAL.json: ${e.getMessage}")
    }
    println(compact)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
