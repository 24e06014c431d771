package graft

/** Ad-hoc perf probe for the heavy operators. Scale findings (sf0.1 base,
  * corpus replicated ×2/×4 in /tmp):
  *  - minhashPairs: runtime tracks OUTPUT size — measured per-pair cost
  *    is flat across replication under the MEMORY_AND_DISK persist:
  *    base 14.5s/958k pairs = 15.1 µs, ×2 34.3s/3.84M = 8.9 µs,
  *    ×4 168.9s/15.35M = 11.0 µs (no eviction/recompute storms). The
  *    synthetic corpus is pathologically homogeneous (~50% of all pairs
  *    are true ≥0.9 near-dups), so output — and hence time — is
  *    inherently quadratic there. On a realistic corpus (near-dup rate
  *    ≪ 1%) the same pipeline is ~linear: candidates are band-bucket
  *    collisions only. `maxBucketSize` bounds the adversarial case
  *    (replication puts every clone family in one bucket).
  *  - ngramJaccardPairs: same profile (×4: 25.0s/34k pairs).
  *  - knnBruteForce: flat ~1-2s — query count fixed, one corpus scan.
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
      // stage split (sf0.1 r3: signatures 0.2 s, candidate distinct is
      // the rest — the operator is output-bound, per-pair cost flat)
      time(s"minhash signatures $d")(graft.dedup.Dedup.signatureProbe(spark, d))
      time(s"minhash candidates $d")(graft.dedup.Dedup.candidateProbe(spark, d))
      time(s"minhash $d")(graft.dedup.Dedup.minhashPairs(spark, d).count())
      time(s"ngram   $d")(graft.dedup.Dedup.ngramJaccardPairs(spark, d).count())
      time(s"knn_bf  $d")(graft.sim.Similarity.knnBruteForce(spark, d).count())
      time(s"clusters  $d")(graft.dedup.Dedup.nearDupClusters(spark, d).count())
      time(s"canonical $d")(graft.dedup.Dedup.canonicalDocs(spark, d).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
