package graft
import org.apache.spark.sql.functions._
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    graft.functions.ArrayOps.register(spark)
    val docs = Tables.documents(spark, d)
      .withColumn("toks", expr("array_distinct(split(text, ' '))"))
      .withColumn("th", expr("transform(toks, t -> CAST(conv(substr(md5(t),1,15),16,10) AS BIGINT) % 1000000007)"))
      .withColumn("sig", expr("transform(sequence(0, 15), i -> array_min(transform(th, h -> ((2*i+1)*h + 7*i+3) % 1000000007)))"))
      .withColumn("th", expr("array_sort(array_distinct(th))"))
      .select(col("doc_id"), col("th"), col("sig"))
    time("sig compute")(docs.count())
    val cached = docs.cache()
    time("cache fill")(cached.count())
    val bands = cached.select(col("doc_id"), explode(expr(
      "transform(sequence(0, 3), b -> named_struct('band', b, 'k1', element_at(sig, b*4+1), 'k2', element_at(sig, b*4+2), 'k3', element_at(sig, b*4+3), 'k4', element_at(sig, b*4+4)))")).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.k1").as("k1"), col("bb.k2").as("k2"), col("bb.k3").as("k3"), col("bb.k4").as("k4"))
    val cand = bands.as("a").join(bands.as("b"), Seq("band","k1","k2","k3","k4"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val nc = time("candidates")(cand.count())
    println(s"candidates: $nc")
    val ta = cached.select(col("doc_id").as("doc_a"), col("th").as("th_a"))
    val tb = cached.select(col("doc_id").as("doc_b"), col("th").as("th_b"))
    val full = cand.join(ta, "doc_a").join(tb, "doc_b")
      .filter(least(expr("size(th_a)"), expr("size(th_b)")) >= lit(0.9) * greatest(expr("size(th_a)"), expr("size(th_b)")))
      .withColumn("inter", expr("sorted_intersect_size(th_a, th_b)"))
      .withColumn("j", col("inter") / (expr("size(th_a)") + expr("size(th_b)") - col("inter")))
      .filter(col("j") >= 0.9)
    time("verify+filter")(full.count())
    time("full cached pipeline again")(full.count())
    spark.stop()
  }
}
