package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table, evaluated in ONE
  * pass (a single aggregation — no per-rule scans): not-null, uniqueness,
  * range, and referential-integrity checks, reported as one row per rule
  * with violation counts. The gate every bronze→silver promotion needs.
  */
object DataQuality {

  sealed trait Rule { def name: String }
  case class NotNull(colName: String) extends Rule { def name = s"not_null_$colName" }
  case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    def name = s"range_$colName"
  }
  /** Violations = rows beyond one representative per distinct NON-NULL
    * value (`count(*) - count(distinct c)`): duplicates AND nulls count —
    * a null is not a usable unique identifier. */
  case class Unique(colName: String) extends Rule { def name = s"unique_$colName" }

  /** Referential-integrity rule for [[gateReport]]: `fk` values of the
    * checked batch must resolve in `parent.pk` (a null fk is an orphan —
    * it identifies no parent). Evaluated as one left-anti-join count. */
  case class Ri(name: String, fk: String, parent: DataFrame, pk: String)

  /** One driver-side pass: (total rows, per-rule (name, violations)).
    * `extra` appends pre-built violation-count aggregates (the RI orphan
    * sums of [[gateReport]]) to the SAME single aggregation job. */
  private def checkRows(df: DataFrame, rules: Seq[Rule],
      extra: Seq[(String, Column)] = Nil): (Long, Seq[(String, Long)]) = {
    // aggregate aliases are indexed — two rules of the same type on the
    // same column (e.g. two InRange bounds) must not collide
    val aggs: Seq[Column] = rules.zipWithIndex.map {
      case (NotNull(c), i) =>
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"__r$i")
      case (InRange(c, lo, hi), i) =>
        sum(when(col(c) < lo || col(c) > hi, 1).otherwise(0)).cast("long").as(s"__r$i")
      case (Unique(c), i) =>
        (count(lit(1)) - countDistinct(col(c))).cast("long").as(s"__r$i")
    } ++ extra.zipWithIndex.map { case ((_, c), i) =>
      c.cast("long").as(s"__x$i")
    } :+ count(lit(1)).cast("long").as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    (row.getAs[Long]("__total"),
      rules.zipWithIndex.map { case (r, i) => (r.name, row.getAs[Long](s"__r$i")) } ++
        extra.zipWithIndex.map { case ((n, _), i) => (n, row.getAs[Long](s"__x$i")) })
  }

  /** Evaluate rules against `df`. NotNull/InRange fold into one
    * aggregation pass; each Unique adds one distinct-count aggregate in
    * the same pass. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (total, rows) = checkRows(df, rules)
    rows.map { case (name, v) => (name, total, v, v == 0L) }
      .toDF("rule", "n_rows", "n_violations", "passed")
      .orderBy(col("rule"), col("n_violations"))
  }

  /** [[check]] plus referential-integrity rows — the full promotion-gate
    * report, evaluated as ONE Spark action (a single aggregation job):
    * each [[Ri]] parent contributes its distinct keys as a left-joined
    * marker relation, so an unmatched (or null) fk leaves the marker null
    * and the orphan count becomes a plain conditional sum alongside the
    * rule counts — R parents ⇒ R joins feeding ONE aggregate over ONE
    * scan of the batch, instead of the R+1 scans a count()-per-rule loop
    * pays (at 100 TB the batch scan dominates; the gate must not multiply
    * it by the rule count). Parents are dimension-sized, so the joins
    * broadcast; on a cluster a non-broadcastable parent degrades to a
    * shuffle join inside the same single job. Every row carries the batch
    * total; a batch promotes iff every `passed` is true
    * (see [[ExtractLoad.runGated]]). Single-action shape pinned by
    * `SourcesAndQualitySpec` ("gateReport is one Spark action"). */
  def gateReport(df: DataFrame, rules: Seq[Rule], ri: Seq[Ri]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // distinct() keeps join cardinality 1:1 — a duplicate parent key must
    // not multiply batch rows (that would corrupt every other count)
    val withMarkers = ri.zipWithIndex.foldLeft(df) { case (acc, (r, i)) =>
      acc.join(r.parent.select(col(r.pk).as(s"__gate_pk$i")).distinct(),
        acc(r.fk) === col(s"__gate_pk$i"), "left")
    }
    val riAggs = ri.zipWithIndex.map { case (r, i) =>
      r.name -> sum(when(col(s"__gate_pk$i").isNull, 1).otherwise(0))
    }
    val (total, rows) = checkRows(withMarkers, rules, riAggs)
    rows.map { case (name, v) => (name, total, v, v == 0L) }
      .toDF("rule", "n_rows", "n_violations", "passed")
      .orderBy(col("rule"), col("n_violations"))
  }

  /** Referential integrity: rows of `child` whose `fk` has no match in
    * `parent.pk` (left-anti join — one shuffle, broadcastable parent). */
  def orphans(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.join(parent, child(fk) === parent(pk), "left_anti")
}
