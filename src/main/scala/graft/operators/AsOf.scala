package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the latest
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native as-of join; rather than a custom SparkPlan, this
  * composes built-ins (preference (a) in the build rules): tag + union
  * both sides, one window pass per key ordered by (ts, side) with
  * `last(..., ignoreNulls)` carrying the right payload forward, keep left
  * rows. Cost: ONE shuffle on the key — no range nested-loop, no
  * per-row probing; scales like any windowed aggregation at 100 TB.
  * Right rows sort before left rows at equal timestamps, giving the
  * standard inclusive (`<=`) as-of semantics.
  */
object AsOf {

  /** @param left       probe side
    * @param right      reference side (must share `key` column name)
    * @param key        equi-join key column name
    * @param leftTs     event-time column name on `left`
    * @param rightTs    event-time column name on `right`
    * @param payload    right columns to attach (renamed as given)
    * @param rightTieBreak column on `right` that deterministically orders
    *   rows sharing the same (key, ts) — the LARGEST wins, matching
    *   "latest version" semantics. None derives a stable tie-break by
    *   hashing the payload columns (deterministic, but arbitrary; pass a
    *   real id column when one exists).
    *
    * Precondition: payload values carried forward are looked up with
    * `last(..., ignoreNulls = true)`, so a right row whose payload value
    * is genuinely NULL is skipped PER COLUMN and an older row's value
    * carries instead (DuckDB ASOF would attach the null). Supply non-null
    * payload columns, or coalesce a sentinel before joining, if null
    * payloads must win.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payload: Map[String, String],
      rightTieBreak: Option[String] = None): DataFrame = {
    val lCols = left.columns
    // the tie-break keeps its NATURAL type — casting to string would
    // order numeric versions lexicographically ("9" > "10") and carry the
    // older row's payload forward
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
    // nulls coalesce to "" (concat_ws SKIPS null args, so without it a
    // null in one column is indistinguishable from the column missing)
    val tie = rightTieBreak.map(c => col(c))
      .getOrElse(md5(concat_ws("",
        payload.keys.toSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)))
    val r0 = payload.foldLeft(
        right.select((Seq(col(key), col(rightTs).as("__ts"), tie.as("__tie")) ++
          payload.keys.toSeq.map(col)): _*)) { case (df, (src, dst)) =>
        df.withColumnRenamed(src, s"__p_$dst")
      }
      .withColumn("__side", lit(0))
    // align schemas: left gets null payload slots, right gets null left cols
    val lAligned = payload.values.foldLeft(l) { case (df, dst) =>
      df.withColumn(s"__p_$dst", lit(null).cast(r0.schema(s"__p_$dst").dataType))
    }
    val rAligned = lCols.filterNot(c => c == key).foldLeft(r0) { case (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lAligned.select((lCols.map(col) ++
      Seq(col("__ts"), col("__side"), col("__tie")) ++
      payload.values.toSeq.map(d => col(s"__p_$d"))): _*)
      .unionByName(rAligned.select((lCols.map(col) ++
        Seq(col("__ts"), col("__side"), col("__tie")) ++
        payload.values.toSeq.map(d => col(s"__p_$d"))): _*))

    // __tie breaks right-row ties at equal (key, ts) deterministically —
    // the last right row in window order (= max tie value) is the one
    // whose payload carries forward; left rows (__side=1, null tie) still
    // sort after all right rows at the same ts
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.values.foldLeft(unioned) { case (df, dst) =>
      df.withColumn(dst, last(col(s"__p_$dst"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((lCols.map(col) ++ payload.values.toSeq.map(col)): _*)
  }
}
