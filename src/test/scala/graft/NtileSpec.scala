package graft

import java.nio.file.Files
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed ntile reconstruction must match SQL ntile EXACTLY,
  * including the fill rule when the row count is NOT divisible by the
  * tile count (the oracle fixture has n divisible by 10, so this edge is
  * pinned here: first n mod k tiles get the extra row). */
class NtileSpec extends SparkSpec {

  test("rank-derived deciles equal window ntile on a non-divisible count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ntile").toString
    // 23 customers, one order each → n=23, k=10: tiles of 3,3,3,2,2,…
    val orders = Seq.tabulate(23)(i =>
      (i.toLong + 1, i.toLong, "O", ((i * 37) % 23) * 100.0 + 0.25))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.parquet(s"$dir/orders.parquet")

    val got = graft.queries.Extras.customerNtileSegments(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val ref = orders
      .groupBy(col("o_custkey"))
      .agg(Fns.money(Fns.sumMoney(col("o_totalprice"))).as("revenue"))
      .withColumn("decile", ntile(10).over(Window.orderBy(col("revenue"), col("o_custkey"))))
      .groupBy(col("decile")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    assert(got == ref)
    assert(got.values.sum == 23L)
    assert(got(1) == 3L && got(10) == 2L)
  }
}
