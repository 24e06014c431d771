package graft

/** Ad-hoc perf probe for the heavy operators. Scale findings (sf0.1 base,
  * corpus replicated ×2/×4 in /tmp):
  *  - minhashPairs: runtime tracks OUTPUT size (~11-14 µs/pair constant);
  *    the synthetic corpus is pathologically homogeneous (~50% of all
  *    pairs are true ≥0.9 near-dups), so output — and hence time — is
  *    inherently quadratic there. On a realistic corpus (near-dup rate
  *    ≪ 1%) the same pipeline is ~linear: candidates are band-bucket
  *    collisions only.
  *  - knnBruteForce: sublinear vs total work growth (broadcast queries,
  *    one corpus scan).
  * Usage: runMain graft.MiniBench [dir ...]
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    for (d <- dirs) {
      time(s"minhash $d")(graft.dedup.Dedup.minhashPairs(spark, d).count())
      time(s"ngram   $d")(graft.dedup.Dedup.ngramJaccardPairs(spark, d).count())
      time(s"knn_bf  $d")(graft.sim.Similarity.knnBruteForce(spark, d).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
