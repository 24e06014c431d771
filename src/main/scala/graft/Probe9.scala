package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway round-9 A/B probe (deleted before round end). */
object Probe9 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrayOps.register(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def triangle(hint: Boolean): Long = {
      val adjS = graft.queries.Graphs.coPurchaseAdjacency(spark, dir)
      val ori = adjS
        .select(col("src").as("u"), col("outdeg").as("du"),
          explode(col("nbrs")).as("m"))
        .join(adjS.select(col("src").as("m"), col("outdeg").as("dm")), "m")
        .filter(struct(col("dm"), col("m")) > struct(col("du"), col("u")))
      val adjO = ori.groupBy(col("u"))
        .agg(sort_array(collect_list(col("m"))).as("onbrs"))
        .localCheckpoint(true)
      val right = adjO.select(col("u").as("dst"), col("onbrs").as("nv"))
      val lists = adjO
        .select(col("u").as("src"), col("onbrs").as("nu"),
          explode(col("onbrs")).as("dst"))
        .join(if (hint) right.hint("merge") else right, "dst")
        .select(col("src"), col("dst"), expr("sorted_intersect(nu, nv)").as("ws"))
        .filter(size(col("ws")) > 0)
      val sinks = lists.select(explode(col("ws")).as("part"), lit(1L).as("t"))
      val bases = lists.select(
        explode(array(col("src"), col("dst"))).as("part"),
        size(col("ws")).cast("long").as("t"))
      sinks.union(bases)
        .groupBy(col("part")).agg(sum(col("t")).as("n_triangles"))
        .orderBy(col("n_triangles").desc, col("part"))
        .limit(20).count()
    }
    (1 to 3).foreach { pass =>
      println(s"== pass $pass ==")
      time("triangle default")(triangle(false))
      Sessions.releaseAll(spark)
      time("triangle merge-hint")(triangle(true))
      Sessions.releaseAll(spark)
    }
    spark.stop()
  }
}
