package graft

import org.apache.spark.sql.functions._
import graft.engine.Layout

class LayoutSpec extends SparkSpec {

  test("z-value interleaves bits (known Morton codes)") {
    import spark.implicits._
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 5)).toDF("x", "y")
    val got = df.select(Layout.zValue(col("x"), col("y"))).collect().map(_.getLong(0))
    // morton(x,y) with x at even bits: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (2,0)=4
    // (3,5) = x bits 11 -> 0b0101, y bits 101 -> 0b100010 -> 0b100111 = 39
    assert(got.sameElements(Array(0L, 1L, 2L, 3L, 4L, 39L)))
  }

  test("z-order layout shrinks per-partition bounding boxes vs random layout") {
    val li = Tables.lineitem(spark, sf)
      .select(pmod(col("l_partkey"), lit(256)).cast("int").as("x"),
        pmod(col("l_suppkey"), lit(256)).cast("int").as("y"))

    def avgArea(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max(col("x")) - min(col("x")) + 1) *
          (max(col("y")) - min(col("y")) + 1)).as("area"))
        .agg(avg(col("area"))).head().getDouble(0)
      spans
    }

    val random = li.repartition(16)
    val zordered = Layout.zorderBy(li, "x", "y", 16)
    val (ra, za) = (avgArea(random), avgArea(zordered))
    // random partitions span ~the whole 256x256 space; z-order should cut
    // the average bounding box by at least 4x
    assert(za < ra / 4, s"zorder area $za vs random $ra")
  }
}
