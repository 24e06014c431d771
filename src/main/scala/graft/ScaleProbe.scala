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
