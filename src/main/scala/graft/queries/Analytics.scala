package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Fns, Tables}
import graft.engine.Prefix

/** Analytic operators over the fixture tables: Pareto frontier,
  * weighted systematic sampling, exponential smoothing, robust outlier
  * reporting, column profiling, and a rare-bigram novelty signal.
  *
  * Common design rule (see [[graft.Fns]]): every floating aggregate is
  * decimal-accumulated and money-rounded at the output boundary, and
  * every order-dependent computation either rides the distributed
  * two-pass scan ([[graft.engine.Prefix]]) or is deliberately windowed
  * over a provably small relation (daily aggregates), never an
  * unpartitioned window over row-scale data.
  */
object Analytics {

  /** 2-D Pareto frontier of parts: minimize `p_retailprice`, maximize
    * `p_size`. A (price, size) pair survives iff no other pair has
    * price ≤ and size ≥ with at least one strict.
    *
    * Scale shape: dedup to DISTINCT (price, size) pairs first (bounded
    * by the price-grid × size-domain product, far below row count), then
    * one distributed exclusive prefix-MAX ([[Prefix.exclusiveScanMax]])
    * over the composite order (price asc, size desc): a pair is
    * dominated exactly when some earlier pair's size ≥ its own — no
    * all-pairs join, no single-task global window. The composite order
    * is encoded as one long key (price on the 1e-4 money grid × 1000 +
    * inverted size), unique per distinct pair as the scan requires. */
  def partSkyline(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.part(spark, dir)
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("psize"))
      .agg(count(lit(1)).as("n_parts"))
    // the packed key assumes 0 <= p_size <= 999 and price >= 0; a domain
    // change outside that range must fail LOUDLY, not scan in a corrupted
    // order and return a silently wrong frontier
    val keyed = pairs
      .withColumn("ord",
        when(col("psize").between(0, 999) && col("price") >= 0,
          floor(col("price") * 10000 + 0.5).cast("long") * 1000 +
            (lit(999L) - col("psize")))
          .otherwise(raise_error(concat(
            lit("partSkyline: composite key out of range (p_size="),
            col("psize"), lit(", price="), col("price"),
            lit(") — the packed order assumes 0<=p_size<=999, price>=0")))))
      .withColumn("sz", col("psize").cast("long"))
    Prefix.exclusiveScanMax(keyed, "ord", "sz", "prior_max_size")
      .filter(col("sz") > col("prior_max_size"))
      .select(col("price"), col("psize"), col("n_parts"))
      .orderBy(col("price"))
  }

  /** Systematic probability-proportional-to-size (PPS) sampling of
    * orders weighted by `o_totalprice` — the weighted-sampling step of a
    * corpus-mixture pipeline (pick documents proportional to a quality
    * or importance weight), in the all-integer systematic form so the
    * draw is a pure function of the data (no RNG, no float compare).
    *
    * Scheme: weights on the 1e-4 money grid as longs; an EXCLUSIVE
    * distributed prefix sum assigns each order its cumulative offset;
    * with stride = total/n, an order is drawn iff its weight interval
    * [cum, cum+w) crosses a stride boundary. Orders heavier than the
    * stride are certainty draws (drawn once, `bucket` records the last
    * boundary crossed). Exactly the classic systematic PPS design, with
    * the sequential cumulation replaced by [[Prefix.exclusiveScan]] —
    * one range-shuffle + two narrow passes at any scale. */
  def ppsSample(spark: SparkSession, dir: String, n: Int = 100): DataFrame = {
    val w = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        floor(col("o_totalprice") * 10000 + 0.5).cast("long").as("wt"))
    val cum = Prefix.exclusiveScan(w, "o_orderkey", "wt", "cum")
    // integral floor-division on the LONG sum — the double-division form
    // agrees with the oracle's // only while total weight < 2^53
    val stride = cum.agg(expr(s"sum(wt) div $n").as("stride"))
    cum.crossJoin(broadcast(stride)) // 1-row scalar relation, Catalyst's scalar-subquery shape
      .filter(expr("(cum + wt) div stride") > expr("cum div stride"))
      .select(col("o_orderkey"), col("o_totalprice"),
        expr("(cum + wt) div stride").as("bucket"))
      .orderBy(col("o_orderkey"))
  }

  /** Daily revenue with an exponentially-weighted moving average,
    * α = 1/2, truncated at 30 lags: `ewma_t = Σ_{k=0..29} rev_{t-k} /
    * 2^(k+1)`. The dyadic weights are EXACT doubles and each product is
    * an exact binary scaling, so both engines sum the same 30 values in
    * the same order — deterministic without decimal accumulation.
    * During the first 29 days the truncated weights sum to < 1 (startup
    * bias ~2^-lag), documented rather than renormalized to keep the
    * arithmetic exact.
    *
    * The 30-lag window runs over the DAILY aggregate — a few thousand
    * rows at any corpus size (days, not orders) — the same deliberate
    * smallness argument as [[Extras.dailyRevenueFilled]]; the heavy
    * per-order aggregation below it is fully distributed. */
  def ewmaRevenue(spark: SparkSession, dir: String, lags: Int = 30): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(Fns.money(Fns.sumMoney(col("o_totalprice"))).as("day_revenue"))
    val win = Window.orderBy(col("day"))
    val ewma = (0 until lags)
      .map(k => coalesce(lag(col("day_revenue"), k).over(win), lit(0.0)) *
        lit(math.pow(0.5, k + 1)))
      .reduce(_ + _)
    daily
      .select(col("day"), col("day_revenue"), Fns.money(ewma).as("ewma_revenue"))
      .orderBy(col("day"))
  }

  /** DuckDB oracle for [[ewmaRevenue]] — the same 30 exact dyadic terms
    * in the same left-to-right order. */
  def ewmaRevenueOracleSql(lags: Int = 30): String = {
    val terms = (0 until lags)
      .map(k => s"coalesce(lag(day_revenue, $k) OVER (ORDER BY day), 0.0) * ${math.pow(0.5, k + 1)}")
      .mkString(" + ")
    s"""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               ${Fns.moneySql(Fns.sumMoneySql("o_totalprice"))} AS day_revenue
        FROM orders GROUP BY 1)
      SELECT day, day_revenue,
             ${Fns.moneySql(terms)} AS ewma_revenue
      FROM daily ORDER BY day
    """
  }

  /** Robust outlier report per order priority: exact median, MAD
    * (median absolute deviation), and the count of orders outside
    * median ± 3·MAD — the heavy-tail audit a feature pipeline runs
    * before deciding clipping bounds (compare [[Extras.winsorizedStats]],
    * which uses percentile bounds instead).
    *
    * Two grouped exact-percentile passes (median, then MAD over the
    * deviations after a broadcast join of the PRIORITY-CARDINALITY
    * median relation); both cutoffs are money-rounded before the
    * comparison so the outlier predicate tests 1e-4-grid values — no
    * engine-ulp sensitivity. At 100 TB the exact percentile swaps for
    * `approx_percentile` (same plan shape, documented at
    * `quality_gate_per_lang`). */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), col("o_totalprice"))
    val med = o.groupBy(col("priority"))
      .agg(Fns.money(expr("percentile(o_totalprice, 0.5)")).as("med"))
    val dev = o.join(broadcast(med), "priority")
      .withColumn("adev", abs(col("o_totalprice") - col("med")))
    val mad = dev.groupBy(col("priority"))
      .agg(Fns.money(expr("percentile(adev, 0.5)")).as("mad"))
    dev.join(broadcast(mad), "priority")
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum((col("adev") > lit(3.0) * col("mad")).cast("long")).as("n_outliers"))
      .orderBy(col("priority"))
  }

  /** Single-pass column profiler over `orders` — the table-health report
    * (row count, null count, exact distinct count, numeric min/max per
    * column) that data-quality tooling derives its checks from.
    *
    * ONE aggregation computes every metric (multiple exact
    * count-distincts share a single Expand-based aggregate — no
    * per-column table scans); the wide 1-row result is then unpivoted to
    * the long (column, metrics) form with `stack`. Non-numeric columns
    * report NULL min/max rather than engine-formatted strings (casting
    * doubles/timestamps to VARCHAR is engine-dialect quicksand). */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
    val cols = o.schema.fieldNames.toSeq
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"))
        else Seq(lit(null).cast("double").as(s"${c}__min"),
          lit(null).cast("double").as(s"${c}__max")))
    }
    val wide = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`").mkString(", ")
    wide.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_num, max_num)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
      .orderBy(col("col_name"))
  }

  /** Day-of-week seasonality profile of revenue: per ISO weekday, the
    * mean daily revenue and its ratio to the overall daily mean (the
    * seasonal index a forecasting pipeline divides out before trend
    * fitting). The heavy per-order aggregation is fully distributed;
    * everything above it is day- then 7-cardinality. Means are
    * decimal-accumulated and money-rounded BEFORE the index division so
    * the ratio divides two 1e-4-grid doubles — identical on any engine. */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(Fns.money(Fns.sumMoney(col("o_totalprice"))).as("rev"))
    val dow = daily
      .groupBy((weekday(col("day")) + 1).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        Fns.money(Fns.sumMoney(col("rev")) / count(lit(1))).as("dow_mean"))
    val overall = daily
      .agg(Fns.money(Fns.sumMoney(col("rev")) / count(lit(1))).as("overall_mean"))
    dow.crossJoin(broadcast(overall)) // 1-row scalar relation
      .select(col("dow"), col("n_days"), col("dow_mean"),
        Fns.money(col("dow_mean") / col("overall_mean")).as("seasonal_index"))
      .orderBy(col("dow"))
  }

  /** Per-priority ordinary-least-squares revenue trend: slope of
    * `o_totalprice` against the order's epoch-day, as an annualized
    * drift — "regression as aggregation": OLS needs only the five power
    * sums (n, Σx, Σx², Σy, Σxy), each a map-side-combinable aggregate,
    * so the fit is ONE distributed pass with O(1) state per group (the
    * same exact-power-sum discipline as `lineitem_stats`).
    *
    * Determinism: x is an integer day; Σx/Σx² accumulate as
    * DECIMAL(38,0) (exact, and immune to the long overflow Σx² would
    * hit near ~2e10 rows); Σy/Σxy as DECIMAL(38,8) (y is on the money
    * grid, so products with integer x stay on it). The slope is then a
    * fixed tree of double ops over identical doubles — engine-identical
    * — and money-rounded after annualizing. */
  def revenueTrend(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("x"),
        col("o_totalprice").as("y"))
    // product operands use BOUNDED decimal precisions (20,8)×(10,0) so
    // neither engine's result precision exceeds 38 — DuckDB silently
    // promotes over-precision decimal products to DOUBLE, losing exactness
    val nD = count(lit(1)).cast("double")
    val sxD = sum(col("x").cast("decimal(38,0)")).cast("double")
    // operands cast to decimal BEFORE the product (the long x*x would
    // silently wrap — or throw under ANSI — past ~3e9, unlike the oracle's
    // DECIMAL(10,0) operands)
    val sx2D = sum(col("x").cast("decimal(10,0)") * col("x").cast("decimal(10,0)"))
      .cast("double")
    val syD = sum(col("y").cast("decimal(38,8)")).cast("double")
    val sxyD = sum(col("y").cast("decimal(20,8)") * col("x").cast("decimal(10,0)"))
      .cast("double")
    val slope = (nD * sxyD - sxD * syD) / (nD * sx2D - sxD * sxD)
    p.groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"),
        Fns.money(syD / nD).as("mean_price"),
        Fns.money(slope * lit(365.0)).as("slope_per_year"))
      .orderBy(col("priority"))
  }

  /** Association rules from co-purchase baskets: for the top directed
    * part pairs, support (pair count), confidence P(b|a) and lift
    * P(a,b)/(P(a)P(b)) — the level-2 Apriori output ranked by support.
    *
    * Scale shape: pair generation is the per-order self-join (bounded
    * by basket size², never corpus² — same argument as `basket_pairs`);
    * the per-item counts and the basket total attach by broadcast.
    * Ratios divide exact integers under a fixed double-op tree and are
    * money-rounded; ranking ties break on integer keys only. */
  def basketRules(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val itemCnt = items.groupBy(col("part")).agg(count(lit(1)).as("cnt"))
    val nBaskets = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = items.withColumnRenamed("part", "part_a")
      .join(items.withColumnRenamed("part", "part_b"), "okey")
      .filter(col("part_a") =!= col("part_b"))
      .groupBy(col("part_a"), col("part_b")).agg(count(lit(1)).as("pair_count"))
    pairs
      .join(broadcast(itemCnt.withColumnRenamed("part", "part_a")
        .withColumnRenamed("cnt", "cnt_a")), "part_a")
      .join(broadcast(itemCnt.withColumnRenamed("part", "part_b")
        .withColumnRenamed("cnt", "cnt_b")), "part_b")
      .crossJoin(broadcast(nBaskets)) // 1-row scalar relation
      .select(col("part_a"), col("part_b"), col("pair_count"),
        Fns.money(col("pair_count").cast("double") / col("cnt_a").cast("double"))
          .as("confidence"),
        Fns.money((col("pair_count").cast("double") * col("n_baskets").cast("double")) /
          (col("cnt_a").cast("double") * col("cnt_b").cast("double"))).as("lift"))
      .orderBy(col("pair_count").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** RFM (recency / frequency / monetary) customer segmentation: each
    * customer scored 1–4 on each axis against the EXACT quartile
    * cutoffs of the axis distribution, then segments aggregated — the
    * classic marketing-analytics mart, built without a single window:
    * cutoffs are a 1-row broadcast relation and scoring is three
    * comparisons per customer (vs an ntile window's global sort).
    *
    * Determinism: recency is an integer day count, frequency an
    * integer, monetary decimal-accumulated then money-rounded; all nine
    * quartile cutoffs are money-rounded before comparison so both
    * engines compare identical doubles. Score = 1 + (x > q25) +
    * (x > q50) + (x > q75) — monotone, total, and engine-identical. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(datediff(max(to_date(col("o_orderdate"))), lit("1970-01-01").cast("date"))
        .as("lastday"),
        count(lit(1)).as("frequency"),
        Fns.money(Fns.sumMoney(col("o_totalprice"))).as("monetary"))
    val maxDay = perCust.agg(max(col("lastday")).as("corpus_max"))
    val scored0 = perCust.crossJoin(broadcast(maxDay)) // 1-row scalar relation
      .withColumn("recency", (col("corpus_max") - col("lastday")).cast("long"))
    val cuts = scored0.agg(
      Fns.money(expr("percentile(recency, 0.25)")).as("r25"),
      Fns.money(expr("percentile(recency, 0.5)")).as("r50"),
      Fns.money(expr("percentile(recency, 0.75)")).as("r75"),
      Fns.money(expr("percentile(frequency, 0.25)")).as("f25"),
      Fns.money(expr("percentile(frequency, 0.5)")).as("f50"),
      Fns.money(expr("percentile(frequency, 0.75)")).as("f75"),
      Fns.money(expr("percentile(monetary, 0.25)")).as("m25"),
      Fns.money(expr("percentile(monetary, 0.5)")).as("m50"),
      Fns.money(expr("percentile(monetary, 0.75)")).as("m75"))
    def score(c: Column, q25: Column, q50: Column, q75: Column): Column =
      (lit(1) + (c > q25).cast("int") + (c > q50).cast("int") + (c > q75).cast("int"))
    scored0.crossJoin(broadcast(cuts)) // 1-row scalar relation
      .select(col("custkey"), col("monetary"),
        // recency scores INVERT: recent (small) = best (4)
        (lit(5) - score(col("recency").cast("double"), col("r25"), col("r50"), col("r75")))
          .as("r_score"),
        score(col("frequency").cast("double"), col("f25"), col("f50"), col("f75"))
          .as("f_score"),
        score(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        Fns.money(Fns.sumMoney(col("monetary")) / count(lit(1))).as("avg_monetary"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Join-key skew diagnosis for `lineitem.l_partkey`: the top-20
    * heaviest keys with their share of all rows, plus the
    * Herfindahl–Hirschman concentration index (×10⁴, the standard
    * scaling) — the report that decides whether a key needs salting
    * ([[graft.operators.SkewJoin]]) before a shuffle join.
    *
    * Determinism: HHI is computed in the integer form Σcnt² / total²
    * (Σcnt² decimal-accumulated exactly), NOT as a float sum of
    * per-key share² — so partial-aggregation order cannot change a
    * bit. One shuffle (the key count) + a 1-row scalar attach. */
  def partkeySkew(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val cnt = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("part")).agg(count(lit(1)).as("cnt"))
    // per-row product in DECIMAL operands (19,0)×(19,0) like the oracle —
    // the long cnt*cnt form wraps (or throws under ANSI) past cnt ~3e9
    val tot = cnt.agg(sum(col("cnt")).as("total"),
      sum(col("cnt").cast("decimal(19,0)") * col("cnt").cast("decimal(19,0)"))
        .as("sumsq"))
    cnt.crossJoin(broadcast(tot)) // 1-row scalar relation
      .select(col("part"), col("cnt"),
        Fns.money(col("cnt").cast("double") / col("total").cast("double") * 100)
          .as("share_pct"),
        Fns.money(col("sumsq").cast("double") /
          (col("total").cast("double") * col("total").cast("double")) * 10000)
          .as("hhi_x10k"))
      .orderBy(col("cnt").desc, col("part"))
      .limit(k)
  }

  /** Rare-bigram novelty per document: the fraction of a document's
    * adjacent token bigrams whose CORPUS frequency is ≤ `maxFreq` — high
    * ratios flag boilerplate-free/novel text, low ratios flag templated
    * text; a standard cheap quality signal next to [[graft.text
    * .TextAnalysis.quality]].
    *
    * Scale shape: one explode to (doc, bigram), one hash agg for corpus
    * counts, one equi-join back on the bigram key (the inverted-index
    * join shape shared with `decontaminate`), one per-doc agg. The join
    * key relation is bigram-vocabulary-scale; hot bigrams are exactly
    * the non-rare ones, so a `maxShingleFreq`-style cap is unnecessary —
    * the signal only needs the ≤ maxFreq tail to be exact. */
  def bigramNovelty(spark: SparkSession, dir: String, maxFreq: Int = 2): DataFrame = {
    val bigrams = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(
        "explode(zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), " +
          "slice(split(text, ' '), 2, size(split(text, ' ')) - 1), " +
          "(a, b) -> concat(a, ' ', b)))").as("bigram"))
    val corpus = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("bg_count"))
    bigrams.join(corpus, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("bg_count") <= maxFreq).cast("long")).as("n_rare"),
        Fns.money(sum((col("bg_count") <= maxFreq).cast("long")) / count(lit(1)))
          .as("rare_ratio"))
      .orderBy(col("doc_id"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007 — public papers, re-expressed) over the customer table:
    * quasi-identifiers are (nation, market segment, account-balance
    * band); the sensitive attribute is the customer's order priority.
    * Each QI equivalence class reports its size, its sensitive-value
    * diversity, and whether it meets k-anonymity (size ≥ k) and
    * l-diversity (≥ l distinct sensitive values) — the audit a privacy
    * review runs before releasing a training extract.
    *
    * Scale shape: one equi-join keyed on custkey, then one grouped
    * aggregate on the QI key with two DISTINCT aggregates (Catalyst's
    * Expand rewrite — shuffle keyed on (QI, value), map-side partials,
    * no windows). The equivalence-class relation is bounded by the QI
    * domain product, not row count. */
  // ---- 2-feature OLS (normal equations, Cramer) — shared algebra ----
  // The solve tail operates only on the nine named sums with * - / and
  // parentheses, so ONE text serves both Spark SQL and DuckDB verbatim
  // (the per-dialect part is feature extraction + the sums, which use
  // the money/sumMoney discipline). M = [[n,s1,s2],[s1,s11,s12],
  // [s2,s12,s22]], b = [sy,s1y,s2y].
  private[graft] val olsDet =
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2))"
  private[graft] val olsDet0 =
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y))"
  private[graft] val olsDet1 =
    "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2))"
  private[graft] val olsDet2 =
    "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2))"
  /** SELECT-list tail of the solve — shared verbatim by both engines. */
  private[graft] def olsTailSql: String = {
    import graft.Fns.moneySql
    val (d, d0, d1, d2) = (olsDet, olsDet0, olsDet1, olsDet2)
    val sse = s"(syy - ($d0 * sy + $d1 * s1y + $d2 * s2y) / $d)"
    s"""CAST(n AS BIGINT) AS n_docs,
           ${moneySql(s"$d0 / $d")} AS beta0,
           ${moneySql(s"$d1 / $d")} AS beta1,
           ${moneySql(s"$d2 / $d")} AS beta2,
           ${moneySql(s"1.0 - $sse / (syy - sy * sy / n)")} AS r2"""
  }

  /** Learned quality predictor — the distillation step that replaces an
    * expensive signal with a linear model over cheap surface features:
    * OLS of lexical entropy (the expensive target) on ln(token count)
    * and stopword ratio, solved in closed form via the 3×3 normal
    * equations (Cramer), coefficients + R² in one pass.
    *
    * Numeric discipline: features and their cross products are
    * money-rounded per row, the nine sums decimal-accumulate
    * ([[graft.Fns.sumMoney]] — order-independent), and the Cramer solve
    * is a fixed double-op tree whose TEXT is shared verbatim with the
    * DuckDB oracle ([[olsTailSql]]) — no way for the two engines to
    * disagree on association order.
    *
    * Scale shape: one equi-join of two per-doc relations, then a single
    * aggregation to 10 scalars — O(1) state, map-side partials, no
    * second pass (R² uses the normal-equation SSE identity instead of
    * re-scoring residuals). */
  def qualityOls(spark: SparkSession, dir: String): DataFrame = {
    val feats = graft.text.TextAnalysis.lexicalDiversity(spark, dir)
      .select(col("doc_id"), col("entropy_bits").as("y"))
      .join(graft.text.TextAnalysis.quality(spark, dir)
        .select(col("doc_id"), Fns.money(log(col("n_tokens"))).as("x1"),
          col("stopword_ratio").as("x2")), "doc_id")
    val sums = feats.agg(
      count(lit(1)).cast("double").as("n"),
      Fns.sumMoney(col("x1")).as("s1"),
      Fns.sumMoney(col("x2")).as("s2"),
      Fns.sumMoney(col("y")).as("sy"),
      Fns.sumMoney(Fns.money(col("x1") * col("x1"))).as("s11"),
      Fns.sumMoney(Fns.money(col("x1") * col("x2"))).as("s12"),
      Fns.sumMoney(Fns.money(col("x2") * col("x2"))).as("s22"),
      Fns.sumMoney(Fns.money(col("x1") * col("y"))).as("s1y"),
      Fns.sumMoney(Fns.money(col("x2") * col("y"))).as("s2y"),
      Fns.sumMoney(Fns.money(col("y") * col("y"))).as("syy"))
    sums.selectExpr(olsTailSql.split(",\n").map(_.trim): _*)
  }

  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5, l: Int = 2): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
      .agg(
        countDistinct(col("c_custkey")).as("group_size"),
        countDistinct(col("o_orderpriority")).as("n_sensitive"))
      .withColumn("k_anonymous", col("group_size") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
}
