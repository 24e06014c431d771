package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Fns, Tables}

/** Event-table operators: incremental watermark scans, semi-structured
  * (JSON) extraction, and time-windowed aggregation.
  *
  *  - watermark predicate: reference `dags/utils/extract_load_template.py:126-159`
  *  - JSON-in-string props: stand-in for the reference's XML-in-string
  *    Demographics column (`dags/customer_pipeline.py:74-90`), exercised
  *    with `get_json_object`/`from_json`
  *  - tumbling-window agg: the Structured Streaming-compatible batch
  *    form ([[graft.streaming.EventStream]] runs the same transform on a
  *    stream)
  */
object Events {

  /** Incremental extract with a (fixed, reproducible) watermark — strictly
    * `>`, pushed down to the parquet scan.
    *
    * When the source stores nanosecond longs, the predicate is translated
    * to the RAW column (`ns > wm_us*1000 + 999` ⟺ `ns div 1000 > wm_us`)
    * so it reaches the scan as `PushedFilters: GreaterThan(ts, …)` and
    * prunes row groups — filtering the derived µs timestamp would force a
    * full scan at 100 TB. */
  def incrementalExtract(spark: SparkSession, dir: String,
      watermark: String = "2024-01-05 00:00:00"): DataFrame = {
    val raw = Tables.read(spark, dir, "events")
    val filtered = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val wmInstant = java.time.LocalDateTime
          .parse(watermark.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
        val wmMicros = wmInstant.getEpochSecond * 1000000L + wmInstant.getNano / 1000L
        raw.filter(col("ts") > lit(wmMicros * 1000L + 999L))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.filter(col("ts") > to_timestamp(lit(watermark))) // session-TZ (UTC)
    }
    filtered
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        Fns.money(col("value")).as("value4"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured props through Spark 4's VARIANT type: `parse_json`
    * once into a variant column, then typed `variant_get` extraction —
    * the shredded-on-read path that replaces per-access JSON string
    * parsing (the variant binary encoding parses once, extracts many
    * times; at 100 TB that is the difference between one decode and one
    * decode per field access). */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k_int"))
      .groupBy((col("k_int") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k_int")).cast("long").as("total_k"))
      .orderBy(col("k_bucket"))

  /** JSON property extraction per event (`get_json_object`). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .orderBy(col("event_id"))

  /** Grouped aggregation over event types with per-row-rounded money sums
    * (raw doubles are pre-rounded so decimal accumulation is exact). */
  def byType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Fns.money(Fns.sumMoney(Fns.money(col("value")))).as("total_value"),
        Fns.money(Fns.sumMoney(get_json_object(col("props"), "$.k").cast("int"))).as("total_k"))
      .orderBy(col("event_type"))

  /** Ordered 3-stage funnel (view → click → purchase): a user converts a
    * stage only with an event STRICTLY AFTER their earliest arrival at
    * the previous stage — the product-analytics query every event store
    * ships. Staged as per-stage min-timestamp aggregates chained by
    * equi-joins on `user_id`:
    * each stage filters its event type FIRST (predicate reaches the
    * scan), aggregates map-side to one row per user, then joins the
    * previous stage's survivors — so the shuffles carry user-cardinality
    * rows, not event-cardinality, and every join/agg keys on the same
    * `user_id` (one partitioning, reused). The window-function
    * alternative (per-user sort of ALL events) shuffles and sorts the
    * full event log; this never materializes a per-user timeline.
    *
    * The per-stage aggregates are localCheckpoint'd (eager, reclaimable
    * by the context cleaner — persist-without-unpersist is the leak to
    * avoid): t1 feeds both its own count and stage 2, t2 its count and
    * stage 3, and without the cut each consumer re-derives its stage
    * from a fresh event scan (6 fact scans instead of 3). The
    * checkpointed frames are user-cardinality — orders of magnitude
    * below event-cardinality. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    def stageMin(t: String) = ev.filter(col("event_type") === t)
    val t1 = stageMin("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .localCheckpoint(true)
    val t2 = stageMin("click").join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      .localCheckpoint(true)
    val t3 = stageMin("purchase").join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    Seq(("1_view", t1), ("2_click", t2), ("3_purchase", t3))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("stage"))
  }

  /** Cohort retention matrix: users grouped by the day of their FIRST
    * event (the cohort), counted on every day they were active —
    * (cohort_day, activity_day, n_users). One user-keyed aggregate for
    * cohorts, one distinct (user, day) projection for activity, one
    * equi-join on `user_id`, one final small aggregate: the join carries
    * user×active-day rows (≪ events), and the event scan reads only
    * (user_id, ts). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_format(col("first_ts"), "yyyyMMdd").cast("int").as("cohort_day"))
    val active = ev
      .select(col("user_id"), date_format(col("ts"), "yyyyMMdd").cast("int").as("activity_day"))
      .distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"), col("activity_day"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("activity_day"))
  }

  /** Hourly volume anomalies per event type: z-score of each hour's
    * count against that type's own mean/stddev over all hours, keeping
    * |z| > 2. The moments come from EXACT integer power sums (count,
    * Σc, Σc² — all < 2⁵³, so bit-exact in doubles on any engine); the
    * scalar algebra on top is plain IEEE, so the oracle matches without
    * the merge-order hazard of built-in `stddev` (the
    * [[Extras.lineitemStats]] discipline). Two hash aggregates + a
    * broadcast-sized per-type stats join — no window, no sort until the
    * final output ordering. */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("c"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("c")).cast("double").as("sx"),
        sum(col("c") * col("c")).cast("double").as("sxx"))
    val z = (col("c") - col("sx") / col("n")) /
      sqrt((col("n") * col("sxx") - col("sx") * col("sx")) / (col("n") * (col("n") - 1)))
    hourly.join(broadcast(stats), "event_type")
      .filter(abs(z) > 2) // gate on the RAW ratio; report money-rounded
      .select(col("event_type"), col("hour"), col("c").as("n_events"),
        Fns.money(z).as("zscore"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Overlapping promo-window attribution via the bucketed range join
    * ([[graft.operators.RangeJoin]]): 40 ten-day windows sliding by 3
    * days (so each event day belongs to up to 4 windows), events matched
    * ON day BETWEEN window bounds. The bucket width (7) keeps interval
    * replication ≤ 2-3 rows while the join stays a hash equi-join — the
    * plan Spark's native range handling (nested loop) cannot produce. */
  def rangeJoinWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("d"),
        Fns.money(col("value")).as("value4"))
    val base = datediff(lit("2024-01-01").cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    val windows = spark.range(0, 40).select(
      col("id").as("window_id"),
      (base + col("id") * 3).as("start_day"),
      (base + col("id") * 3 + 9).as("end_day"))
    graft.operators.RangeJoin.bucketed(ev, "d", windows, "start_day", "end_day", 7L)
      .groupBy(col("window_id"))
      .agg(
        count(lit(1)).as("n_events"),
        Fns.money(Fns.sumMoney(col("value4"))).as("total_value"))
      .orderBy(col("window_id"))
  }

  /** Mergeable distinct-count rollup via DataSketches HLL — THE
    * pre-aggregation pattern for distinct counts at 100 TB: build one
    * small sketch per (day, event_type) ONCE, then answer "distinct
    * users for any day range / any type subset" by UNIONING sketches —
    * no rescan of the raw events, no second shuffle over user ids.
    * (Plain count_distinct cannot pre-aggregate: distinct counts don't
    * add.) Returns the per-day sketch table; [[sketchEstimate]] is the
    * serving-side union+estimate. */
  def dailyUserSketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Union the daily sketches over `[fromDay, toDay]` per event type and
    * estimate distinct users — the dashboard query over the rollup. */
  def sketchEstimate(sketches: DataFrame, fromDay: String, toDay: String): DataFrame =
    sketches
      .filter(col("day") >= to_date(lit(fromDay)) && col("day") <= to_date(lit(toDay)))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("approx_users"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("event_type"))

  /** ORACLE-VERIFIABLE twin of the [[dailyUserSketches]] →
    * [[sketchEstimate]] rollup: a 64-register HLL whose every step —
    * h64 hash, bucket split, rank ladder, register max, scaled harmonic
    * sum, alpha correction — is replayed verbatim by the DuckDB oracle
    * ([[graft.Fns.hllRankSql]]/[[Fns.hllWeightSql]] emit the SAME SQL
    * text to both engines; no log2/pow, which aren't correctly rounded
    * cross-engine). The DataSketches pair above stays the production
    * path (bias-corrected, dense/sparse switching); this one puts the
    * sketch ALGEBRA under the correctness gate.
    *
    * Mergeability is the property on trial: Spark builds per-DAY
    * register sets first ([[dailyUserSketches]]'s shape) and unions them
    * by per-register max, while the oracle aggregates the whole range in
    * one level — equal outputs prove max-of-maxes ≡ single-pass, i.e.
    * the rollup answers any ad-hoc day range without rescanning raw
    * events. Raw HLL estimate only (no small-range linear counting — its
    * ln() isn't portable); `exact_users` sits alongside for the error.
    *
    * Scale shape: two map-side-combinable aggs over (day,type,bucket)
    * then (type,bucket) — ≤ 64 registers per group survive each combine;
    * no shuffle grows with the fact. */
  def dailyUserSketchEst(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val regs = ev.select(col("event_type"), to_date(col("ts")).as("day"),
        Fns.h64(col("user_id").cast("string")).as("h"))
      .withColumn("bucket", col("h") % 64)
      .withColumn("w", expr("h div 64"))
      .withColumn("r", expr(Fns.hllRankSql("w")))
      // the mergeable rollup: one 64-register sketch per (day, type)
      .groupBy(col("day"), col("event_type"), col("bucket"))
      .agg(max(col("r")).as("r"))
      // serve: union across days = per-register max of maxes
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("r")).as("r"))
    val est = regs.groupBy(col("event_type"))
      .agg(sum(expr(Fns.hllWeightSql("r"))).as("s_present"),
        count(lit(1)).as("m_present"))
      .withColumn("s_total",
        col("s_present") + (lit(64L) - col("m_present")) * lit(Fns.HllEmptyWeight))
      .select(col("event_type"),
        Fns.money(lit(0.70934) * lit(4096) * lit(Fns.HllEmptyWeight)
          / col("s_total").cast("double")).as("approx_users"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("event_type")).orderBy(col("event_type"))
  }

  /** Count-min heavy hitters with ORACLE-REPLAYABLE hash math: a
    * depth×width counter matrix from salted h64 hashes (`user_id#i` per
    * row i — the d pairwise-independent hash functions), probed for every
    * candidate key by min-over-rows, top-k by estimate. The built-in
    * `count_min_sketch` spec ([[graft.CountMinSpec]]) keeps covering the
    * production codec; this puts the CMS ALGEBRA (counter build, min
    * probe, one-sided error) under the correctness gate — the oracle
    * replays the identical salted hashes in SQL.
    *
    * Scale shape: the counter matrix is depth×width rows — bounded by
    * SKETCH DIMENSIONS, not data, so its broadcast is scale-safe (unlike
    * the fact-table hints removed from the marts). Candidates here are
    * all distinct keys (fixture-sized); at 100 TB the serve path probes
    * a specific key list against the same broadcast counters. */
  def cmHeavyHitters(spark: SparkSession, dir: String,
      depth: Int = 3, width: Int = 512, k: Int = 20): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val rows = ev.select(col("user_id"),
        explode(array((1 to depth).map(i => struct(lit(i).as("i"),
          (Fns.h64(concat(col("user_id").cast("string"), lit(s"#$i"))) % width)
            .as("bucket"))): _*)).as("hb"))
      .select(col("user_id"), col("hb.i").as("i"), col("hb.bucket").as("bucket"))
    val counters = rows.groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    rows.distinct()
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col("user_id")).agg(min(col("cnt")).as("est_count"))
      .orderBy(col("est_count").desc, col("user_id"))
      .limit(k)
  }

  /** Tumbling 1-hour window aggregation — batch twin of the streaming
    * windowed count. Emits the window start as a plain timestamp column
    * for the oracle. */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Fns.money(Fns.sumMoney(Fns.money(col("value")))).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Salted skew join exercised end-to-end
    * ([[graft.operators.SkewJoin.salted]]): events (the big, potentially
    * hot-keyed side) join a derived per-type dimension on `event_type`,
    * spread over 8 salt buckets, then rolled up per type. The oracle
    * replays the UNSALTED join — proving the salt+replicate+join
    * composition is result-identical to the plain join, which is the
    * property that lets an operator swap it in under a skewed key
    * without a semantics review. The dim side carries a `shuffle_hash`
    * hint so the join actually exercises the salted SHUFFLE path (a
    * broadcast join has no per-reducer skew to fix; at real scale the
    * optimizer makes that call).
    *
    * On this fixture event_type is near-uniform — the query pins
    * correctness and plan shape; the 100 TB rationale is in the
    * operator's scaladoc. */
  def saltedTypeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("type_code", Fns.h64(col("event_type")))
    graft.operators.SkewJoin.salted(
      ev.select(col("event_id"), col("event_type"), col("value")),
      dim.hint("shuffle_hash"), "event_type", col("event_id"), salts = 8)
      .groupBy(col("event_type"), col("type_code"))
      .agg(count(lit(1)).as("n_events"),
        Fns.money(Fns.sumMoney(Fns.money(col("value")))).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** Null-safe equality join (`<=>` / SQL `IS NOT DISTINCT FROM`) — the
    * join a nullable business key actually needs: plain `=` silently
    * DROPS every null-keyed row (null = null is null, not true), the
    * classic silent-data-loss bug in dimension lookups with optional
    * keys. Here the nullable key is derived (`nullif(k % 5, 0)` — bucket
    * 0 becomes NULL), a per-key dimension is built over the SAME
    * null-safe grouping, and the join must route the null-keyed events
    * to the null dimension row rather than losing them. The count
    * invariant (every event appears exactly once) is what `=` would
    * break. Null-safe equality is hash-joinable in Spark — null becomes
    * an ordinary key value, no plan penalty. */
  def nullSafeBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("k_int", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("bucket", nullif(pmod(col("k_int"), lit(5)), lit(0)))
    val dim = ev.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bucket_total"))
    ev.join(broadcast(dim), ev("bucket") <=> dim("bucket"))
      .drop(dim("bucket"))
      .groupBy(col("bucket"), col("bucket_total"))
      .agg(count(lit(1)).as("n_events"),
        Fns.money(Fns.sumMoney(Fns.money(col("value")))).as("total_value"))
      .orderBy(col("bucket").asc_nulls_first)
  }

  /** Concurrent-session analysis via the interval-OVERLAP join
    * ([[graft.operators.RangeJoin.intervalOverlap]]): gap-sessionize
    * every user, then count, per user, how many OTHER users' sessions
    * overlapped theirs in time — the concurrency/contention primitive
    * behind capacity planning and co-presence features. A naive overlap
    * join is a non-equi nested loop over |sessions|²; the bucketed form
    * is one hash shuffle on hour buckets with exactly-once first-bucket
    * emission. Pair orientation is canonical (user_a < user_b) and the
    * count is grouped on the smaller id — deterministic on any engine. */
  /** Telemetry debounce: keep only the FIRST event of every quiet-gap
    * burst per (user, event type) — the duplicate-suppression rule for
    * retry storms and double-clicks (an event within `gapSeconds` of
    * its predecessor is a re-fire, not a signal), reported as per-type
    * keep counts and the suppressed ratio.
    *
    * Same gap-flag idiom as `sessionize` (lag + integer epoch-second
    * difference — engine-identical); the window partitions by
    * (user, type), so per-partition work is bounded by one user's
    * events, never corpus-wide. */
  def eventDebounce(spark: SparkSession, dir: String,
      gapSeconds: Long = 300): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("kept",
        (col("prev_ts").isNull ||
          (col("ts").cast("long") - col("prev_ts").cast("long") > gapSeconds))
          .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("kept")).cast("long").as("n_kept"))
      .withColumn("debounce_ratio",
        Fns.money(lit(1.0) - col("n_kept") / col("n_events")))
      .orderBy(col("event_type"))
  }

  def sessionOverlapCounts(spark: SparkSession, dir: String): DataFrame = {
    val sessions = graft.streaming.EventStream
      .sessionWindows(Tables.events(spark, dir))
      .select(col("user_id"),
        unix_micros(col("first_ts")).as("s_start"),
        unix_micros(col("last_ts")).as("s_end"))
    val a = sessions.select(col("user_id").as("user_a"),
      col("s_start").as("a_start"), col("s_end").as("a_end"))
    val b = sessions.select(col("user_id").as("user_b"),
      col("s_start").as("b_start"), col("s_end").as("b_end"))
    graft.operators.RangeJoin
      .intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end",
        bucketWidth = 3600L * 1000000L)
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a").as("user_id"))
      .agg(count(lit(1)).as("n_overlaps"),
        countDistinct(col("user_b")).as("n_peers"))
      .orderBy(col("user_id"))
  }

  /** First-order Markov transition matrix over per-user event timelines:
    * how often does event type A directly precede event type B, and with
    * what conditional probability? The sequence-analytics primitive
    * behind next-action prediction and anomalous-flow detection.
    *
    * Scale shape: one keyed window (partitioned by user — no global
    * sort) produces the lagged pairs; the transition matrix is a
    * type²-cardinality hash agg with map-side partials, and the
    * row-normalizing window runs over that tiny matrix, not the events.
    * The probability is a single IEEE division of two exact longs —
    * deterministic on any engine. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    pairs.groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_transition",
        Fns.money(col("n_transitions") /
          sum(col("n_transitions")).over(
            Window.partitionBy(col("prev_type")))))
      .orderBy(col("prev_type"), col("event_type"))
  }
}
