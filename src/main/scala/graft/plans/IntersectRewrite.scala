package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.SortedIntersectSize

/** Optimizer rule: `size(array_intersect(a, b))` → native merge-scan
  * [[SortedIntersectSize]] whenever both inputs are PROVABLY sorted and
  * duplicate-free long arrays (syntactically `array_sort(array_distinct(…))`,
  * possibly through aliases resolved upstream). array_intersect builds a
  * per-call hash set and materializes the intersection array only for its
  * size to be taken — the rewrite makes the common near-dup verification
  * shape allocation-free without the query author knowing the native
  * function exists. Registered via [[graft.GraftExtensions]].
  */
object IntersectRewrite extends Rule[LogicalPlan] {

  private def sortedDistinctLongs(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(c), _, _) => c.dataType == ArrayType(LongType, false) ||
      c.dataType == ArrayType(LongType, true)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), legacy)
          if !legacy && sortedDistinctLongs(l) && sortedDistinctLongs(r) =>
        SortedIntersectSize(l, r)
    }
}
