package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Cross-validation of the hand-built MinHash+LSH pipeline against
  * spark-mllib's MinHashLSH: both should agree on high-jaccard near-dup
  * pairs (different hash families and banding, so agreement is
  * statistical, not exact — asserted on the ≥0.95 subset where both have
  * near-total recall). */
class MllibCrossCheckSpec extends SparkSpec {

  test("hand-built minhash pairs agree with mllib MinHashLSH on near-certain dups") {
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", expr("array_distinct(split(text, ' '))"))
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val vecs = tf.transform(docs).select(col("doc_id"), col("features"))

    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(6).setSeed(42L)
    val model = lsh.fit(vecs)
    val mllibPairs = model.approxSimilarityJoin(vecs, vecs, 0.05, "jaccard_dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val minePairs = Dedup.minhashPairs(spark, sf, threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    assert(minePairs.nonEmpty && mllibPairs.nonEmpty)
    // every pair with exact jaccard ≥ 0.95 that mllib surfaced should be
    // in our output too (our exact-verify keeps only true ≥0.95 pairs)
    val agreement = (minePairs intersect mllibPairs).size.toDouble /
      math.max(1, minePairs.size)
    assert(agreement > 0.8, s"agreement=$agreement mine=${minePairs.size} mllib=${mllibPairs.size}")
  }

  test("deterministic Lloyd's centroids are competitive with spark-ml KMeans (WSSSE)") {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    import graft.sim.Similarity

    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(_.getSeq[Double](1).toArray)

    def wssse(cents: Seq[Array[Double]]): Double =
      vecs.map { v =>
        cents.map { c =>
          var s = 0.0; var i = 0
          while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
          s
        }.min
      }.sum

    val mine = Similarity.kmeansFit(spark, sf, k = 10, iters = 3).map(_.c.toArray)

    val mlDf = spark.createDataFrame(
      vecs.toIndexedSeq.map(v => Tuple1(Vectors.dense(v)))).toDF("features")
    val ml = new KMeans().setK(10).setSeed(7L).setMaxIter(10).fit(mlDf)
    val mlCents = ml.clusterCenters.map(_.toArray).toSeq

    val myCost = wssse(mine); val mlCost = wssse(mlCents)
    // cosine-assignment Lloyd's vs Euclidean spark-ml: same ballpark is
    // the bar — a labels-in-disguise "quantizer" would not clear it
    assert(myCost <= mlCost * 1.5, s"mine=$myCost mllib=$mlCost")
  }
}
