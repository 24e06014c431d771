package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's own bloom-filter expressions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its runtime join filters (`InjectRuntimeFilter`) but does not expose
  * them in the SQL registry — registering them makes the same machinery
  * available to queries that want an EXPLICIT semi-join prune (e.g.
  * bloom-pruned decontamination: no false negatives, so an exact join
  * behind the prune returns exactly the unpruned result).
  *
  * `bloom_might_contain`'s analysis check requires the filter argument
  * to be foldable or a plan expression — pass the built filter as a
  * scalar subquery (`(SELECT bf FROM built)`), which also keeps the
  * bloom bytes OUT of the task binary: the subquery result ships once
  * per executor as a broadcast value, unlike a literal, which would
  * re-embed the ~MB bitmap in every task closure (the same trap as the
  * typedLit k-means centroids this repo already replaced). */
object Bloom {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
