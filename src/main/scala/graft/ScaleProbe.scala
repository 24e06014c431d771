package graft

/** Ad-hoc scale probe for the round's new text operators: time the same
  * operator at ×1/×2/×4 corpus replication to verify the claimed
  * complexity empirically (findings recorded in the operators' scaladoc).
  * Usage: runMain graft.ScaleProbe <dir> [dir ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    // --span <baseDir>: replicate documents ×1/×2/×4 with distinct ids
    // and time spanDedup — duplication depth grows, distinct chunks stay
    // constant, so time should track the explode volume (≈ linear)
    if (args.headOption.contains("--span")) {
      import org.apache.spark.sql.functions._
      val base = Tables.documents(spark, args(1)).select(col("doc_id"), col("text"))
      val mults = args.lift(2).map(_.split(',').toSeq.map(_.toInt)).getOrElse(Seq(1, 2, 4))
      for (m <- mults) {
        val rep = (0 until m).map(i => base.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
          .reduce(_.unionAll(_))
        val path = s"/tmp/span_x$m"
        rep.write.mode("overwrite").parquet(s"$path/documents.parquet")
        // consume n_kept + clean_md5 so Catalyst cannot eliminate the
        // keeper join (count() alone prunes a unique-key left join away)
        def run(): Long = graft.text.TextAnalysis.spanDedup(spark, path)
          .agg(sum(col("n_kept")), max(col("clean_md5"))).head().getLong(0)
        run(); Sessions.releaseAll(spark) // warm
        time(f"span_dedup x$m")(run())
        Sessions.releaseAll(spark)
      }
      spark.stop(); return
    }
    for (d <- args.toSeq) {
      time(s"dup_spans    $d")(graft.text.TextAnalysis.dupSpans(spark, d).count())
      time(s"source_quota $d")(graft.text.TextAnalysis.sourceQuota(spark, d).count())
      time(s"quality_gate $d")(graft.text.TextAnalysis.qualityGatePerLang(spark, d).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
