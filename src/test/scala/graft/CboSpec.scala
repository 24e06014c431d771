package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Cost-based-optimizer statistics: prove that ANALYZE TABLE column
  * statistics — not hints — can flip a join to broadcast by estimating
  * a FILTER's output size.
  *
  * The scenario that matters at 100 TB: a big table filtered down to a
  * sliver joins another big table. Size-only estimation scores the
  * filtered side at its full scan size (no broadcast, sort-merge join);
  * with CBO enabled and column stats, the filter's selectivity shrinks
  * the estimate below the broadcast threshold and the exchange-free
  * broadcast plan wins — no `broadcast()` hint in user code, so the
  * SAME query flips plans as the data or predicate changes. Hints pin
  * plans; statistics let the optimizer earn them.
  */
class CboSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("column stats + CBO flip a filtered join to broadcast; size-only estimation does not") {
    val tag = s"cbo_${graft.engine.Fs.runToken}"
    spark.sql(s"DROP TABLE IF EXISTS orders_$tag")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .write.format("parquet").saveAsTable(s"orders_$tag")
    // stats for ALL output columns: CBO sizes a filter's output as
    // estimated rows × row width from per-column avgLen — a column
    // without stats leaves the estimate unusable
    spark.sql(s"ANALYZE TABLE orders_$tag COMPUTE STATISTICS FOR ALL COLUMNS")

    def plan(): String = {
      // near-unique key equality: CBO estimates ~rowCount/ndv(custkey)
      // surviving rows (a sliver); size-only estimation keeps the full
      // scan size
      val filtered = spark.table(s"orders_$tag")
        .filter(col("o_custkey") === 1L)
      val li = Tables.lineitem(spark, sf)
      li.join(filtered, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .queryExecution.explainString(FormattedMode)
    }

    // threshold strictly below the full-table size (so size-only
    // estimation refuses the broadcast) but far above the CBO estimate
    // of the near-unique-key filter's output
    val full = spark.table(s"orders_$tag").queryExecution.optimizedPlan
      .stats.sizeInBytes
    val threshold = (full / 2).toString
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> threshold,
      "spark.sql.cbo.enabled" -> "false") {
      assert(plan().contains("SortMergeJoin"), plan())
    }
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> threshold,
      "spark.sql.cbo.enabled" -> "true") {
      assert(plan().contains("BroadcastHashJoin"), plan())
    }
    spark.sql(s"DROP TABLE IF EXISTS orders_$tag")
  }
}
