package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generic SCD Type 2 dimension maintenance — Spark-first redesign of the
  * reference's product dimension load (`dags/product.py:153-378`):
  * hash-diff change detection (md5 over tracked attributes,
  * `dags/product.py:160-186`), expire-old/insert-new versioning
  * (`dags/product.py:276-361`), and surrogate key assignment.
  *
  * Scale redesigns vs the reference (SURVEY.md §7.5):
  *  - The reference assigns surrogate keys with a GLOBAL unpartitioned
  *    `row_number()` (`dags/product.py:240`) — a single-partition sort that
  *    dies at 100 TB. [[assignIds]] instead range-partitions on the
  *    business key, sorts within partitions, and adds per-partition offsets
  *    via `zipWithIndex` — same deterministic output, no global sort.
  *  - The reference rewrites the whole dimension on expire; [[applyChanges]]
  *    keeps that semantic (dimensions are small relative to facts) but
  *    computes the changed set with a single hash-diff join.
  */
object Scd2 {

  /** @param recencyCol when a source batch can carry several rows per
    *   business key (routine through streaming micro-batches), the column
    *   that orders them — latest wins. None = ties broken by attr-hash
    *   (deterministic, but arbitrary; set recencyCol whenever one exists). */
  case class Config(
      businessKey: String,
      trackedCols: Seq[String],
      surrogateKey: String = "surrogate_key",
      hashCol: String = "attr_hash",
      effectiveCol: String = "effective_date",
      expiryCol: String = "expiry_date",
      currentCol: String = "is_current",
      recencyCol: Option[String] = None)

  /** Backtick-quote a column NAME so `col()` resolves it literally — the
    * generic [[Config]] contract allows names containing dots (which a
    * bare `col("a.b")` would mis-parse as struct-field access); embedded
    * backticks escape by doubling, per the SQL identifier grammar. */
  private def q(name: String): Column =
    col("`" + name.replace("`", "``") + "`")
  private def qa(alias: String, name: String): Column =
    col(s"$alias.`" + name.replace("`", "``") + "`")

  /** md5 change-hash over tracked columns (reference `dags/product.py:160-167`):
    * `md5(concat_ws("|", coalesce(cast(c as string), "")...))`. Callers must
    * pre-format double columns deterministically (e.g. integer cents) —
    * raw double→string rendering is not portable across engines. */
  def attrHash(cols: Seq[String]): Column =
    md5(concat_ws("|", cols.map(c => coalesce(q(c).cast("string"), lit(""))): _*))

  /** Deterministic sequential ids 1..n (+offset) ordered by `orderCol`,
    * without a global single-partition sort: range repartition → local sort
    * → per-partition offset via zipWithIndex. Equivalent to
    * `row_number() OVER (ORDER BY orderCol)` when `orderCol` is unique. */
  def assignIds(df: DataFrame, orderCol: String, idCol: String, offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(q(orderCol)).sortWithinPartitions(q(orderCol))
    // NOTE (measured, round 9): persisting `sorted` before zipWithIndex
    // to save its double traversal REGRESSED the whole SCD2 bench family
    // ~2× at equal host band (columnar cache encode + cache→Row decode
    // cost more than recomputing the dim-sized sort lineage). Keep the
    // recompute; it pipelines inside whole-stage codegen.
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Hash attributes and keep ONE row per business key — latest by
    * `cfg.recencyCol`; ties (or no recency column) break by attr-hash,
    * then by a hash over EVERY column, so the pick is deterministic even
    * when duplicate rows agree on all tracked columns but differ in an
    * untracked one. The reference dedups latest-per-key the same way
    * before its merge (`dags/product.py:174-180`); without it a batch
    * carrying two rows for one key would open two is_current=true
    * versions and break the ≤1-current-per-key invariant. */
  private def hashAndDedup(src: DataFrame, cfg: Config): DataFrame = {
    val allColsHash = md5(concat_ws("",
      src.columns.toIndexedSeq.map(c => coalesce(q(c).cast("string"), lit(""))): _*))
    // max_by over the (recency, attr-hash, all-cols-hash) tuple -- the
    // same total order the previous row_number window used (struct
    // ordering puts a null recency first, i.e. it loses the max,
    // matching desc_nulls_last). An aggregate instead of a window:
    // map-side partial combine and no per-key sort, so a hot business
    // key can never single-thread a window-partition sort.
    val hashed = src.withColumn(cfg.hashCol, attrHash(cfg.trackedCols))
    val ord = struct(cfg.recencyCol.map(q).toSeq ++
      Seq(q(cfg.hashCol), allColsHash): _*)
    val cols = hashed.columns.toIndexedSeq
    hashed.groupBy(q(cfg.businessKey))
      .agg(max_by(struct(cols.map(q): _*), ord).as("__w"))
      // getField, not a string path: col("__w.a.b") would mis-parse a
      // source column literally NAMED "a.b" (the generic Config contract
      // allows any column name the window-based dedup used to accept)
      .select(cols.map(c => col("__w").getField(c).as(c)): _*)
  }

  /** Initial dimension load: hash attributes, assign surrogate keys in
    * business-key order, open all versions as of `asOfDate`
    * (reference initial-load branch `dags/product.py:238-258`). */
  def initialLoad(src: DataFrame, cfg: Config, asOfDate: String): DataFrame = {
    val hashed = hashAndDedup(src, cfg)
    assignIds(hashed, cfg.businessKey, cfg.surrogateKey)
      .withColumn(cfg.effectiveCol, to_date(lit(asOfDate)))
      .withColumn(cfg.expiryCol, lit(null).cast("date"))
      .withColumn(cfg.currentCol, lit(true))
  }

  /** Point-in-time snapshot of an SCD2 dimension: the version of each
    * business key that was current ON `asOfDate` — effective ≤ date <
    * expiry (open versions have null expiry). The "time travel" read
    * every SCD2 consumer eventually needs (join facts to the dimension
    * AS OF the fact date); a pure filter, so partition/row-group pruning
    * on the effective/expiry columns applies at scale. */
  def snapshotAsOf(dim: DataFrame, cfg: Config, asOfDate: String): DataFrame = {
    val d = to_date(lit(asOfDate))
    dim.filter(q(cfg.effectiveCol) <= d &&
      (q(cfg.expiryCol).isNull || q(cfg.expiryCol) > d))
  }

  /** Incremental SCD2 merge: detect new/changed source rows by hash-diff
    * against current versions (reference `dags/product.py:276-302`), expire
    * superseded versions (`:325-346`), and append new versions with
    * surrogate keys continuing after max(sk) (`:349-361`).
    *
    * `dim` must be a prior [[initialLoad]]/[[applyChanges]] output; `src`
    * carries the business key + tracked columns.
    *
    * @param maxSkHint the dimension's max surrogate key, when a caller
    *   already holds it (the gate harvests it from its own single
    *   aggregation job — [[gateBatchesWithMaxSk]]); None runs the
    *   max-scan here, over the FULL dim. */
  def applyChanges(dim: DataFrame, src: DataFrame, cfg: Config, asOfDate: String,
      maxSkHint: Option[Long] = None): DataFrame = {
    val spark = dim.sparkSession
    val k = cfg.businessKey

    val srcHashed = hashAndDedup(src, cfg)
    val current = dim.filter(q(cfg.currentCol))

    // J5: aliased left join, new/changed detection (dags/product.py:276-291)
    val detect = srcHashed.as("source")
      .join(current.as("target"), qa("source", k) === qa("target", k), "left")
      .withColumn("is_new", qa("target", k).isNull)
      .withColumn("is_changed",
        qa("target", k).isNotNull &&
          qa("source", cfg.hashCol) =!= qa("target", cfg.hashCol))

    val upserts = detect.filter(col("is_new") || col("is_changed"))
      .select(srcHashed.columns.map(c => qa("source", c)): _*)

    // J6+F6: expire current versions superseded by a changed source row
    val changedKeys = upserts.select(q(k).as("__changed_key")).distinct()
    val expired = dim.as("dim")
      .join(changedKeys,
        qa("dim", k) === col("__changed_key") && qa("dim", cfg.currentCol),
        "left")
      .withColumn(cfg.expiryCol,
        when(col("__changed_key").isNotNull, to_date(lit(asOfDate)))
          .otherwise(qa("dim", cfg.expiryCol)))
      .withColumn(cfg.currentCol,
        when(col("__changed_key").isNotNull, lit(false))
          .otherwise(qa("dim", cfg.currentCol)))
      .drop("__changed_key")

    // W2+A2 redesign: continue surrogate keys after max(sk) without a
    // global sort (reference dags/product.py:262-263,349-352)
    val maxSk = maxSkHint.getOrElse(
      dim.agg(coalesce(max(q(cfg.surrogateKey)), lit(0L))).first().getLong(0))
    val newVersions = assignIds(upserts, k, cfg.surrogateKey, maxSk)
      .withColumn(cfg.effectiveCol, to_date(lit(asOfDate)))
      .withColumn(cfg.expiryCol, lit(null).cast("date"))
      .withColumn(cfg.currentCol, lit(true))
      .select(expired.columns.map(col): _*)

    expired.unionByName(newVersions)
  }

  /** Promotion gate for an SCD2 merge — the reference count-gates its
    * dimension load before touching the table (`dags/product.py:123,304,315`);
    * this grows that gate into the same declarative-expectation contract
    * as [[DataQuality.gateReport]], plus two SCD2-specific invariants
    * evaluated BEFORE any dimension write:
    *
    *  - `ambiguous_latest` — business keys carrying more than one
    *    distinct attr-hash in the batch with no recency order to pick
    *    "latest" (when `cfg.recencyCol` is set: distinct hashes TIED at
    *    the max recency value). The merge would version one of them
    *    arbitrarily; a batch that can't say which row wins is rejected.
    *  - `expire_blast_radius` — the number of current versions this
    *    batch would expire, counted as violations only when it exceeds
    *    `maxExpirePct` percent of the current dimension. A fat-fingered
    *    upstream reload (every attribute "changed") looks exactly like
    *    this; no legitimate batch rewrites most of a dimension.
    *
    * Cost: ONE aggregation job for everything — per-key partials over the
    * batch (row count, distinct-hash count, winning hash, and the
    * NotNull/InRange rule sums, which compose through the grouping) are
    * full-outer-joined onto the current versions' (key, hash) projection
    * and collapsed by a single global aggregate; ambiguity, blast radius,
    * batch total and the composable rule counts all come out of that one
    * row. Only a [[DataQuality.Unique]] rule — which needs a global
    * distinct on an arbitrary column — adds a second aggregation job.
    * Nothing here reads more than the batch + the current dimension, and
    * the join [[applyChanges]] pays the same join again on promote — a
    * gate that reads nothing the merge wasn't about to read anyway is
    * the 100 TB-safe shape. Returns [[DataQuality.check]]-shaped rows:
    * (rule, n_rows, n_violations, passed) with `n_rows` the batch total. */
  def gate(dim: DataFrame, src: DataFrame, cfg: Config,
      rules: Seq[DataQuality.Rule] = Nil, maxExpirePct: Int = 50): DataFrame =
    gateBatches(dim, Seq(("batch", src)), cfg, rules, maxExpirePct)
      .drop("batch")

  /** Sentinel tag for the current-version union leg of [[gateAgg]]. */
  private val DimTag = " __dim__"

  /** The single aggregation plan behind [[gateBatches]] — exposed to the
    * plan-quality spec so the no-window / no-Expand shape is pinned. */
  private[graft] def gateAgg(dim: DataFrame, batches: Seq[(String, DataFrame)],
      cfg: Config, sumRules: Seq[DataQuality.Rule]): DataFrame = {
    val k = cfg.businessKey
    val tagged = batches.map { case (tag, b) =>
      b.withColumn(cfg.hashCol, attrHash(cfg.trackedCols))
        .withColumn("__tag", lit(tag))
    }.reduce(_.unionByName(_))

    def ruleSum(r: DataQuality.Rule): Column = r match {
      case DataQuality.NotNull(c) => sum(when(col(c).isNull, 1).otherwise(0))
      case DataQuality.InRange(c, lo, hi) =>
        sum(when(col(c) < lo || col(c) > hi, 1).otherwise(0))
      case _ => lit(0L) // Unique never reaches here
    }

    // per-(tag, key) partials: row count, an ambiguity flag (min hash ≠
    // max hash — deliberately NOT countDistinct, whose planner rewrite
    // costs a second exchange; at the max recency value when one exists,
    // since ambiguity only matters where it decides the winner), the
    // winning hash (what hashAndDedup would keep), and the composable
    // rule sums. Grouped aggregates with map-side partials, never a
    // window.
    val perKey = cfg.recencyCol match {
      case None =>
        val aggs = Seq(
          count(lit(1)).as("__cnt"),
          (min(q(cfg.hashCol)) =!= max(q(cfg.hashCol)))
            .cast("int").as("__ambf"),
          // hashAndDedup's no-recency winner is hash-desc ⇒ max(hash)
          max(q(cfg.hashCol)).as("__wh")) ++
          sumRules.zipWithIndex.map { case (r, i) => ruleSum(r).as(s"__s$i") }
        tagged.groupBy(col("__tag"), q(k)).agg(aggs.head, aggs.tail: _*)
      case Some(rc) =>
        val l1 = Seq(
          count(lit(1)).as("__cnt"),
          (min(q(cfg.hashCol)) =!= max(q(cfg.hashCol)))
            .cast("int").as("__ambf1"),
          max(q(cfg.hashCol)).as("__wh1")) ++
          sumRules.zipWithIndex.map { case (r, i) => ruleSum(r).as(s"__s$i") }
        val l2 = Seq(
          sum(col("__cnt")).as("__cnt"),
          // struct max picks the highest-recency row and carries its
          // ambiguity flag + winning hash (null recency loses, like
          // hashAndDedup's desc_nulls_last)
          max(struct(q(rc), col("__ambf1"), col("__wh1"))).as("__m")) ++
          sumRules.indices.map(i => sum(col(s"__s$i")).as(s"__s$i"))
        tagged.groupBy(col("__tag"), q(k), q(rc)).agg(l1.head, l1.tail: _*)
          .groupBy(col("__tag"), q(k)).agg(l2.head, l2.tail: _*)
          .withColumn("__ambf", col("__m.__ambf1"))
          .withColumn("__wh", col("__m.__wh1"))
          .drop("__m")
    }

    // the per-key partials LEFT-join the current versions' (key, hash)
    // projection — an equi-join Catalyst broadcasts for dimension-sized
    // tables (and degrades to a shuffle join for giant ones, still
    // inside this single job) — then ONE aggregate row per tag carries
    // every batch-side gate number. The tag-independent current-version
    // count rides the SAME single action as an extra union leg (a second
    // flat scan of the current projection under a sentinel tag), so the
    // whole gate is exactly one Spark action regardless of batch count.
    // the dim leg also carries the surrogate keys (when the dim has
    // them), so the SAME single action yields max(sk) for the merge
    // that follows a promote — [[applyChanges]] then skips its own
    // max-scan job. The sentinel leg scans the FULL dim (current flag
    // folded into __curf), not just current versions: max(sk) is then
    // correct for ANY caller-supplied dim, including one whose max sk
    // sits on an expired row — the old current-only harvest silently
    // minted colliding sks there (round-10 ADVICE #1). The batch join
    // leg still sees only current versions, as change detection must.
    val dimSk =
      if (dim.columns.contains(cfg.surrogateKey))
        q(cfg.surrogateKey).cast("long") else lit(null).cast("long")
    val dimCur = dim.filter(q(cfg.currentCol))
      .select(q(k).as("__dk"), q(cfg.hashCol).as("__dh"))
    val batchLeg = perKey
      .join(dimCur, q(k) === col("__dk"), "left")
      .select(Seq(
        col("__tag"), col("__cnt"), col("__ambf").cast("long").as("__ambf"),
        when(col("__dh").isNotNull && col("__wh") =!= col("__dh"), 1L)
          .otherwise(0L).as("__chgf"),
        lit(0L).as("__curf"), lit(null).cast("long").as("__dsk")) ++
        sumRules.indices.map(i => col(s"__s$i").cast("long").as(s"__s$i")): _*)
    val dimLeg = dim.select(Seq(
      lit(DimTag).as("__tag"), lit(0L).as("__cnt"), lit(0L).as("__ambf"),
      lit(0L).as("__chgf"),
      when(q(cfg.currentCol) === true, 1L).otherwise(0L).as("__curf"),
      dimSk.as("__dsk")) ++
      sumRules.indices.map(i => lit(0L).as(s"__s$i")): _*)
    val globalAggs = Seq(
      coalesce(sum(col("__cnt")), lit(0L)).as("__total"),
      coalesce(sum(col("__ambf")), lit(0L)).as("__amb"),
      coalesce(sum(col("__chgf")), lit(0L)).as("__nchg"),
      coalesce(sum(col("__curf")), lit(0L)).as("__ncur"),
      max(col("__dsk")).as("__msk")) ++
      sumRules.indices.map(i =>
        coalesce(sum(col(s"__s$i")), lit(0L)).as(s"__v$i"))
    batchLeg.unionByName(dimLeg)
      .groupBy(col("__tag"))
      .agg(globalAggs.head, globalAggs.tail: _*)
  }

  /** [[gate]] over SEVERAL independent batches in the SAME single
    * aggregation job ([[gateAgg]]): the batches union with a tag column,
    * the per-key partials group by (tag, key), the current versions join
    * once and ride the same action as a sentinel-tagged union leg, and
    * one global aggregate row per tag yields every gate number. The
    * shape a backfill runner needs: N queued batches gated against one
    * dimension in one pass.
    * Returns (batch, rule, n_rows, n_violations, passed). */
  def gateBatches(dim: DataFrame, batches: Seq[(String, DataFrame)], cfg: Config,
      rules: Seq[DataQuality.Rule] = Nil, maxExpirePct: Int = 50): DataFrame =
    gateBatchesWithMaxSk(dim, batches, cfg, rules, maxExpirePct)._1

  /** [[gateBatches]] plus the dimension's max surrogate key over ALL
    * versions (current and expired), harvested from the same single
    * aggregation job — the promote path hands it to [[applyChanges]] as
    * `maxSkHint` so the merge skips its own max-scan action. 0 when the
    * dim is empty or carries no surrogate-key column. */
  private[graft] def gateBatchesWithMaxSk(dim: DataFrame,
      batches: Seq[(String, DataFrame)], cfg: Config,
      rules: Seq[DataQuality.Rule] = Nil,
      maxExpirePct: Int = 50): (DataFrame, Long) = {
    val spark = dim.sparkSession
    import spark.implicits._
    require(!batches.exists(_._1 == DimTag),
      s"batch tag '$DimTag' is reserved for the current-version leg")
    // gateAgg groups by tag: two batches sharing one would silently merge
    // into a single combined stats row reported for each duplicate entry
    require(batches.map(_._1).distinct.size == batches.size,
      s"duplicate batch tags: ${batches.map(_._1).diff(batches.map(_._1).distinct).distinct.mkString(", ")}")
    val (distRules, sumRules) = rules.partition(_.isInstanceOf[DataQuality.Unique])
    val byTag = gateAgg(dim, batches, cfg, sumRules)
      .collect()
      .map(r => r.getAs[String]("__tag") -> r).toMap
    val nCurrent = byTag.get(DimTag).map(_.getAs[Long]("__ncur")).getOrElse(0L)
    val maxSk = byTag.get(DimTag)
      .flatMap(r => Option(r.getAs[Any]("__msk")))
      .map(_.asInstanceOf[Number].longValue()).getOrElse(0L)

    val reportRows = batches.flatMap { case (tag, src) =>
      val row = byTag.get(tag)
      def get(f: String): Long = row.map(_.getAs[Long](f)).getOrElse(0L)
      val total = get("__total")
      val nAmbiguous = get("__amb")
      val nChanged = get("__nchg")
      val blast =
        if (nChanged * 100L > nCurrent * maxExpirePct.toLong) nChanged else 0L
      val sumMap = sumRules.zipWithIndex
        .map { case (r, i) => r.name -> get(s"__v$i") }.toMap
      val distMap =
        if (distRules.isEmpty) Map.empty[String, Long]
        else DataQuality.check(src, distRules).collect()
          .map(r => r.getString(0) -> r.getLong(2)).toMap
      val ruleRows = rules.map(r =>
        (tag, r.name, total, sumMap.getOrElse(r.name, distMap(r.name))))
      ruleRows ++ Seq(
        (tag, "ambiguous_latest", total, nAmbiguous),
        (tag, "expire_blast_radius", total, blast))
    }
    (reportRows.map { case (b, n, t, v) => (b, n, t, v, v == 0L) }
      .toDF("batch", "rule", "n_rows", "n_violations", "passed")
      .orderBy(col("batch"), col("rule"), col("n_violations")),
      maxSk)
  }

  /** [[applyChanges]] behind [[gate]]: evaluate the gate, merge ONLY when
    * every rule passes and the batch is non-empty. Returns
    * (promoted, resulting dimension — merged on promote, the input `dim`
    * untouched on reject, report with a `promoted` column). Rejecting
    * without merging keeps the retry contract of
    * [[ExtractLoad.runGated]]: repair upstream, resubmit the batch,
    * nothing to roll back. */
  def applyChangesGated(dim: DataFrame, src: DataFrame, cfg: Config,
      asOfDate: String, rules: Seq[DataQuality.Rule] = Nil,
      maxExpirePct: Int = 50): (Boolean, DataFrame, DataFrame) = {
    val (reportB, maxSk) =
      gateBatchesWithMaxSk(dim, Seq(("batch", src)), cfg, rules, maxExpirePct)
    val report = reportB.drop("batch")
    val rows = report.collect()
    val n = rows.headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    val promoted = rows.forall(_.getAs[Boolean]("passed")) && n > 0
    // the gate's one action already yielded max(sk) — the merge skips its
    // own max-scan job
    val out =
      if (promoted) applyChanges(dim, src, cfg, asOfDate, Some(maxSk)) else dim
    (promoted, out,
      report.withColumn("promoted", lit(promoted)))
  }
}
