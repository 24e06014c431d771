package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Plan-quality assertions: the properties that make these queries
  * survive a 100× scale-up, pinned as tests so a refactor that silently
  * loses a pushdown, widens a scan, or drops a broadcast FAILS here
  * instead of in production.
  */
class PlanQualitySpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("top_products: column pruning reaches both scans") {
    val plan = formatted(graft.queries.Marts.topProducts(spark, sf))
    // the lineitem scan must read exactly the 5 needed columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint," +
      "l_quantity:double,l_extendedprice:double,l_discount:double>"), plan)
    // and part only its 3
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_brand:string>"), plan)
  }

  // The mart pins assert the BOUNDED dims (nation, region, generated
  // dim_date) arrive by broadcast, and that no explicit broadcast hint
  // rides an SF-scaled relation (orders/part/customer/supplier) — a
  // forced hint never size-falls-back, so it would collect the relation
  // at any scale. At fixture scale Catalyst may ALSO choose broadcast
  // for the un-hinted sides (they fit under autoBroadcastJoinThreshold);
  // that choice is AQE's to revisit at 100×, so it is deliberately NOT
  // pinned (no !SortMergeJoin assertions here).

  /** Broadcast hints present in the analyzed logical plan (each renders
    * as a ResolvedHint node) — counts the FORCED broadcasts only. */
  private def hintCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
        if h.hints.strategy.contains(
          org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => h
    }.size

  test("sales_summary: bounded dims broadcast; no forced hint on SF-scaled sides") {
    val df = graft.queries.Marts.salesSummary(spark, sf)
    val plan = formatted(df)
    // nation + region arrive by broadcast-hash
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    // exactly the 2 bounded-dim hints — orders/part/customer un-hinted
    assert(hintCount(df) == 2, s"expected 2 broadcast hints, got ${hintCount(df)}")
  }

  test("sales_summary_calendar: dim_date + nation + region broadcast; no forced hint on SF-scaled sides") {
    val df = graft.queries.Marts.salesSummaryCalendar(spark, sf)
    val plan = formatted(df)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    // dim_date, nation, region — and nothing else — carry the hint
    assert(hintCount(df) == 3, s"expected 3 broadcast hints, got ${hintCount(df)}")
  }

  test("top_products / fact_sales / product_enriched: zero forced broadcasts of SF-scaled relations") {
    assert(hintCount(graft.queries.Marts.topProducts(spark, sf)) == 0)
    assert(hintCount(graft.queries.Marts.factSales(spark, sf)) == 0)
    // productEnriched hints only nation
    assert(hintCount(graft.queries.Marts.productEnriched(spark, sf)) == 1)
  }

  test("bucketed_join: co-located scans feed the join with NO exchange on the join key") {
    val df = graft.queries.Marts.bucketedCustomerJoin(spark, sf)
    val plan = formatted(df)
    // both scans read bucketed: the join consumes the bucket hash
    // partitioning directly — no shuffle of either side
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"), plan)
  }

  test("incremental_extract: watermark predicate reaches the parquet scan") {
    val plan = formatted(graft.queries.Events.incrementalExtract(spark, sf))
    // the raw-ns-column translation makes the filter row-group-prunable
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), plan)
  }

  test("whole-stage codegen covers the mart aggregation pipeline") {
    // AQE reveals codegen spans only in the finalized (executed) plan
    val df = graft.queries.Marts.topProducts(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n) Operator" in the simple string form
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined, plan)
  }

  test("fact_dim_asof: the fact side never sort-merge-joins the dimension") {
    val plan = formatted(graft.queries.Scd2Queries.factDimAsOf(spark, sf))
    // the dim (with its validity-range residual) must arrive by broadcast;
    // SMJ inside the dim BUILD is fine — assert the top fact join is BHJ
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    // lineitem reads only its 3 needed columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"), plan)
  }

  test("decontaminate: benchmark side is broadcast, corpus never shuffles for the join") {
    val plan = formatted(graft.text.TextAnalysis.decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("dedup_incremental: batch index broadcasts; corpus is map-only into the probe join") {
    val plan = formatted(graft.dedup.Dedup.dedupIncremental(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // the only shuffles are the survivor-scale argmax and the final
    // presentation sort: the corpus relation never shuffles, and the
    // multi-band candidate duplicates are absorbed by the argmax — no
    // DISTINCT exchange exists anywhere (BroadcastExchange is not
    // matched by the node-header regex below)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 shuffle exchanges, got $exchanges\n$plan")
  }

  test("gopher_quality: documents scan reads only the needed columns") {
    val plan = formatted(graft.text.TextAnalysis.gopherQuality(spark, sf))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string,n_chars:bigint>"), plan)
  }

  test("decontaminate_bloom: the bloom prune reaches the corpus as a subquery-fed filter") {
    val plan = formatted(graft.text.TextAnalysis.decontaminateBloom(spark, sf))
    // might_contain must appear as a Filter condition fed by a scalar
    // subquery (broadcast once per executor) — NOT as a literal bitmap
    // baked into the task binary, and not optimized away entirely
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("Subquery"), plan)
  }

  test("postings_index: per-term top-k runs as an object-hash aggregate, not a window sort") {
    val plan = formatted(graft.text.TextAnalysis.postingsIndex(spark, sf))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    // corpus scan reads only doc_id + text
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("funnel_conversion: each stage's event-type filter reaches the parquet scan") {
    val plan = formatted(graft.queries.Events.funnelConversion(spark, sf))
    assert(plan.contains("EqualTo(event_type,purchase)"), plan)
    // stages 1-2 are checkpointed at construction, so only the last
    // stage's scan is in the final plan — one filtered scan, no full read
    assert(!plan.contains("EqualTo(event_type,view)"), plan)
  }

  test("customer_ntile_segments: no unpartitioned window anywhere in the plan") {
    val plan = formatted(graft.queries.Extras.customerNtileSegments(spark, sf))
    assert(!plan.contains("Window"), plan)
  }

  test("knn_filtered: the label filter is the join key — broadcast hash join, no cross product") {
    val plan = formatted(graft.sim.Similarity.knnFilteredByLabel(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("doc_chunks: a pure per-row generator — no shuffle before the output sort") {
    val plan = formatted(graft.text.TextAnalysis.docChunks(spark, sf))
    // the only repartitioning is the range one the deterministic ORDER BY
    // needs — no hash shuffle anywhere (no join/agg in the pipeline)
    assert("rangepartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    assert(plan.contains("Generate"), plan)
    // the documents scan reads only doc_id + text
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("edit_dist_pairs: candidates via equi-join on (lang, band) — never a cross product") {
    val plan = formatted(graft.dedup.Dedup.editDistancePairs(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // the length-band join keys are in the join, not a post-filter
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  test("lateral_top_orders: correlated LIMIT subquery decorrelates to a window, no per-row re-execution") {
    val plan = formatted(graft.queries.Extras.lateralTopOrders(spark, sf))
    assert(plan.contains("Window"), plan) // rank-based decorrelation
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("corpus_mixture: normalizing totals attach as a 1-row broadcast, corpus scanned once per branch") {
    val plan = formatted(graft.text.TextAnalysis.corpusMixture(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // the 1-row scalar attach
    assert(!plan.contains("CartesianProduct"), plan)
    // per-source aggregate is map-side combined (partial then final)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("mad_outliers: both percentile relations attach by broadcast — orders never shuffles") {
    val plan = formatted(graft.queries.Analytics.madOutliers(spark, sf))
    // med and mad are priority-cardinality relations; the row-scale side
    // must join them broadcast, not sort-merge
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    // column pruning: only priority + totalprice leave the scan
    assert(plan.contains("ReadSchema: struct<o_totalprice:double,o_orderpriority:string>") ||
      plan.contains("ReadSchema: struct<o_orderpriority:string,o_totalprice:double>"), plan)
  }

  test("part_skyline: no window operator anywhere — dominance rides the distributed scan") {
    val plan = formatted(graft.queries.Analytics.partSkyline(spark, sf))
    assert(!plan.contains("Window"), plan)
  }

  test("ewma_revenue: the only window runs over the daily aggregate, after map-side combine") {
    val df = graft.queries.Analytics.ewmaRevenue(spark, sf)
    val plan = formatted(df)
    // the window exists (30-lag EWMA) but its input is the HashAggregate
    // output — day-cardinality — never the raw orders relation
    assert(plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
    // orders scan reads only the two needed columns
    assert(plan.contains("ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp"), plan)
  }

  test("profile_orders: every metric comes from ONE aggregation pass (Expand, no scan per column)") {
    val plan = formatted(graft.queries.Analytics.profileOrders(spark, sf))
    // multi count-distinct lowers to a single Expand-fed aggregate
    assert(plan.contains("Expand"), plan)
    // exactly one parquet scan of orders (detail headers render once per
    // scan node as "(n) Scan parquet"; the tree line would double-count)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size == 1, plan)
  }

  test("semantic_dedup: within-cluster pairs via cid equi-join — no cartesian product") {
    val plan = formatted(graft.sim.Similarity.semanticDedup(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // the pair self-join must be a hash join keyed on the cluster id
    // (the only nested-loop is the 1-row broadcast centroid attach)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  test("part_similarity_capped: candidates via (band,k1,k2) equi-join — never a cross product") {
    val plan = formatted(graft.queries.Graphs.partSimilarityCapped(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("triangle_counts: all equi-joins — no cartesian product or nested loop anywhere") {
    val plan = formatted(graft.queries.Graphs.triangleCounts(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("basket_rules: item counts and basket total attach by broadcast") {
    val plan = formatted(graft.queries.Analytics.basketRules(spark, sf))
    // two item-count joins broadcast; the only nested loop is the 1-row
    // basket-total scalar attach
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("revenue_trend: one aggregation pass, no join, no window") {
    val plan = formatted(graft.queries.Analytics.revenueTrend(spark, sf))
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size == 1, plan)
  }

  test("part_communities: propagation rounds are equi-joins — no cross product, pruned edge scan") {
    val plan = formatted(graft.queries.Graphs.partCommunities(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("part_kcore: peel rounds are equi-joins over the checkpointed adjacency — no parquet re-read, no cross product") {
    val plan = formatted(graft.queries.Graphs.partKcore(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // all 12 rounds run over the localCheckpointed adjacency: the
    // returned plan must never touch the source table again
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).isEmpty, plan)
  }

  test("dedup_containment: candidates via shingle-hash equi-join — no cross product, docs scan pruned") {
    val plan = formatted(graft.dedup.Dedup.containmentPairs(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // only doc_id + text leave the parquet scan
    val reads = """ReadSchema: struct<([^>]*)>""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.forall(s =>
      s.contains("doc_id") && !s.contains("n_tokens")), plan)
  }

  test("dedup_containment_incr: corpus probe is a broadcast hash join — corpus postings never shuffle") {
    val plan = formatted(graft.dedup.Dedup.containmentIncremental(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the admission promise: the batch prefix index broadcasts and the
    // corpus posting explode meets it map-only — a sort-merge join here
    // would mean the corpus crossed an exchange
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("knn_ivfpq: ADC scan joins probed lists by cid — equi-joins only, no cartesian") {
    val plan = formatted(graft.sim.Similarity.knnIvfPq(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // the codebook/LUT attaches are 1-row broadcasts (nested loop by
    // design); the list pruning itself must be a hash join on cid
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("part_pagerank: adjacency build scans lineitem exactly twice (okey self-join), pruned to 2 columns") {
    val plan = formatted(graft.queries.Graphs.partPagerank(spark, sf))
    // the co-purchase adjacency is ONE okey self-join + ONE aggregate;
    // the old edge-list build scanned more and paid three extra
    // exchanges. The rank loop runs over the checkpoint, so the
    // returned plan must contain NO parquet scan at all (checkpointed
    // adjacency only) — pinning that the per-round work never re-reads
    // the source.
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).isEmpty, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val build = formatted(graft.queries.Graphs.coPurchaseAdjacency(spark, sf))
    // checkpointed relation: plan is the materialized RDD scan
    assert(build.contains("Scan ExistingRDD") || build.contains("LogicalRDD"), build)
  }

  test("media_dedup: one pruned scan, aggregate only — no join, no window") {
    val plan = formatted(graft.multimodal.Multimodal.mediaDedup(spark, sf))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }

  test("media_batches: one pruned scan + one per-type window, no join") {
    val plan = formatted(graft.multimodal.Multimodal.mediaBatches(spark, sf))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    // only doc_id + text leave the scan (payload/media_type derive)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("dsir_weights: ratio broadcasts back; model derives from counts — 1 corpus scan") {
    val plan = formatted(graft.text.TextAnalysis.dsirWeights(spark, sf))
    // the 4096-row bucket-ratio relation must broadcast onto the
    // (doc, bucket) counts — never shuffle the counts by bucket alone
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the checkpointed (doc, bucket) count relation feeds BOTH the model
    // chain (per-bucket counts + totals) and the scoring join, so the
    // tokenize + bigram explode touches the parquet corpus exactly once
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size == 0, plan)
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("lm_perplexity: model/prefix joins stay equi-joins; only the 1-row vocab scalar nests") {
    // the BUILD chain (runs once per JVM into the derived store): the
    // model/prefix/scoring joins stay equi-joins and the corpus scan is
    // pruned to (doc_id, text)
    val plan = formatted(graft.text.TextAnalysis.lmPerDocScoresBuild(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // doc-bigram ⋈ model ⋈ prefix are hash joins on g / w1
    assert("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).nonEmpty, plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
    // the QUERY surface serves from the derived store: one narrow
    // numeric read, no bigram chain, no corpus scan
    val served = formatted(graft.text.TextAnalysis.lmPerplexity(spark, sf))
    assert(!served.contains("text:string"), served)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(served).size == 1, served)
  }

  test("knn_pq: the scored scan is the CODED corpus — no full-vector column past encoding") {
    val df = graft.sim.Similarity.knnPq(spark, sf)
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // scoring = coded corpus × broadcast query LUTs (intentional 1-row-ish
    // nested loop); the re-rank joins vectors back by id as a hash join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
    // the ADC shortlist is the bounded-heap topk_by aggregate, NOT a
    // row_number window over the corpus×queries relation: exactly one
    // logical Window remains (the exact re-rank over shortlist-sized
    // input)
    assert(plan.contains("topk_by"), plan)
    assert(df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size == 1, plan)
  }

  test("triangle_counts + part_similarity: fat node relations join by MERGE, intersects are native") {
    // round-9 finding: a broadcast-hash probe re-copies the matched
    // row's O(deg) array out of the hashed relation per exploded edge
    // (measured 9.4 s broadcast vs 1.4 s merge at sf0.1) — the node
    // relation must stay on the sort-merge path, and the per-edge
    // intersects must be the codegen'd merge scans, not the generic
    // hash-set builtins
    val tri = formatted(graft.queries.Graphs.triangleCounts(spark, sf))
    assert(tri.contains("SortMergeJoin"), tri)
    assert(tri.contains("sortedintersect("), tri)
    assert(!tri.contains("array_intersect"), tri)
    val sim = formatted(graft.queries.Graphs.partSimilarity(spark, sf))
    assert(sim.contains("SortMergeJoin"), sim)
    assert(sim.contains("sortedintersectsize("), sim)
  }

  test("coPurchaseAdjacency: ONE order-keyed exchange, no join in the build") {
    // the pair relation is born from a pipelined double explode between
    // the okey aggregate and the src aggregate — the old self-join shape
    // paid two item exchanges plus a sort-merge join
    val adjPlan = formatted(
      graft.queries.Graphs.coPurchaseAdjacencyPlanProbe(spark, sf))
    assert(!adjPlan.contains("SortMergeJoin") && !adjPlan.contains("BroadcastHashJoin"),
      adjPlan)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(adjPlan).length
    assert(exchanges == 2, s"expected exactly 2 exchanges (okey agg, src agg), got $exchanges\n$adjPlan")
  }

  test("scd2 gate: one aggregation action, no window, ambiguity without a distinct-aggregate expand") {
    val dim = graft.engine.Scd2.initialLoad(
      graft.queries.Scd2Queries.partSource(spark, sf), graft.queries.Scd2Queries.cfg,
      "2024-01-01")
    val plan = formatted(graft.engine.Scd2.gateAgg(
      dim, Seq(("batch", graft.queries.Scd2Queries.secondSource(spark, sf))),
      graft.queries.Scd2Queries.cfg, Nil))
    assert(!plan.contains("Window"), plan)
    // min/max-hash ambiguity flags — countDistinct's Expand rewrite
    // would double the exchange count
    assert(!plan.contains("Expand"), plan)
  }

  test("span_dedup: keeper election and mark-back are hash joins/aggregates — no cross product, no corpus window") {
    val plan = formatted(graft.text.TextAnalysis.spanDedup(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // documents scan reads only doc_id + text
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("tokenizer_coverage: the bounded vocab probes by broadcast — the corpus never shuffles for the join") {
    val plan = formatted(graft.text.TextAnalysis.tokenizerCoverage(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("k_anonymity: both DISTINCT aggregates lower to one Expand-fed pass") {
    val plan = formatted(graft.queries.Analytics.kAnonymity(spark, sf))
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Window"), plan)
    // customer contributes only its 4 needed columns
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>"), plan)
  }

  test("curriculum_order: global rank without any window operator") {
    val plan = formatted(graft.text.TextAnalysis.curriculumOrder(spark, sf))
    assert(!plan.contains("Window"), plan)
  }

  test("source_overlap: exact side is a token equi-join; sketch pair enumeration is the only nested loop") {
    val plan = formatted(graft.dedup.Dedup.sourceOverlap(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // token intersection must be hash-joined on t, never nested-looped
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  test("embedding_quantize: per-dim ranges aggregate once and attach as a 1-row broadcast") {
    val plan = formatted(graft.sim.Similarity.embeddingQuantize(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // the 1-row ranges attach
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
  }

  test("zipf_fit: the rank window runs over the LIMIT-bounded top-n relation only") {
    val plan = formatted(graft.text.TextAnalysis.zipfFit(spark, sf))
    // orderBy+limit lowers to TakeOrderedAndProject — the boundedness proof
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("cluster_topics: term scoring joins are equi-joins; only the bounded centroid relation nests") {
    val plan = formatted(graft.sim.Similarity.clusterTopics(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // the doc→cid and tf⋈df joins must be hash/merge equi-joins
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  /** Logical Window nodes in the optimized plan — the shape the
    * bounded-heap `topk_by` conversions must keep out. */
  private def windowCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size

  test("repetition_signals: modal bigram is a grouped struct-min — no window over the token-scale bigram counts") {
    val df = graft.text.TextAnalysis.repetitionSignals(spark, sf)
    assert(windowCount(df) == 0, formatted(df))
    // both gram relations aggregate with map-side partials
    assert(formatted(df).contains("HashAggregate"), formatted(df))
  }

  test("knn_bruteforce: per-query rank is the bounded-heap topk_by — no window over corpus×queries") {
    val df = graft.sim.Similarity.knnBruteForce(spark, sf)
    assert(windowCount(df) == 0, formatted(df))
    assert(formatted(df).contains("topk_by"), formatted(df))
  }

  test("knn_ivf: probe routing AND list search rank via topk_by — no window anywhere") {
    val df = graft.sim.Similarity.knnIvf(spark, sf)
    assert(windowCount(df) == 0, formatted(df))
    assert(formatted(df).contains("topk_by"), formatted(df))
  }

  test("knn_filtered + hard_negatives: label-scoped ranks via topk_by — no window over candidate sets") {
    val f = graft.sim.Similarity.knnFilteredByLabel(spark, sf)
    assert(windowCount(f) == 0, formatted(f))
    val h = graft.sim.Similarity.hardNegatives(spark, sf)
    assert(windowCount(h) == 0, formatted(h))
    // the negative_label recovery joins the tiny shortlist BY BROADCAST
    assert(formatted(h).contains("BroadcastHashJoin"), formatted(h))
  }

  test("orc: round-trip with pushdown and pruning intact") {
    val tmp = java.nio.file.Files.createTempDirectory("orc").toString
    graft.sources.Formats.writeOrc(Tables.orders(spark, sf), tmp)
    val back = graft.sources.Formats.readOrc(spark, tmp)
    assert(back.count() == Tables.orders(spark, sf).count())
    val q = back.filter(col("o_orderkey") === 42L).select(col("o_totalprice"))
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
  }
}
