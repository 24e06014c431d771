package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AssignCid, DotDouble, LutSum, MinhashSig, Simhash64, SortedIntersect, SortedIntersectAtLeast, SortedIntersectSize, TopKByAgg}

/** SparkSessionExtensions entry point — makes graft's native expressions
  * available to any session via
  * `spark.sql.extensions=graft.GraftExtensions` (cluster deploys) in
  * addition to the programmatic [[graft.functions.ArrayOps.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName, "sorted_intersect"),
      (exprs: Seq[Expression]) => SortedIntersect(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("lut_sum"),
      new ExpressionInfo(classOf[LutSum].getName, "lut_sum"),
      (exprs: Seq[Expression]) => LutSum(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("assign_cid"),
      new ExpressionInfo(classOf[AssignCid].getName, "assign_cid"),
      (exprs: Seq[Expression]) => AssignCid(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => Simhash64(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotDouble].getName, "dot_double"),
      (exprs: Seq[Expression]) => DotDouble(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinhashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_atleast"),
      new ExpressionInfo(classOf[SortedIntersectAtLeast].getName, "sorted_intersect_atleast"),
      (exprs: Seq[Expression]) => SortedIntersectAtLeast(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKByAgg].getName, "topk_by"),
      (exprs: Seq[Expression]) => TopKByAgg(exprs(0), exprs(1), exprs(2))))
    // Spark's own runtime-filter bloom expressions, SQL-visible (the
    // explicit semi-join prune graft.functions.Bloom registers per session)
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.IntersectRewrite)
  }
}
