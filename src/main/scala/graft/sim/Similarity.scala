package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Fns, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  *  - [[knnBruteForce]]: exact top-k by cosine — the correctness baseline.
  *    Query set broadcast against the corpus; per-partition candidate
  *    generation + a single per-query top-k (window), so the corpus is
  *    scanned once, never shuffled by pair.
  *  - [[knnIvf]]: the scale path — IVF-style coarse quantization: cluster
  *    centroids (here: per-`label` means, standing in for k-means), probe
  *    the `nprobe` nearest centroids per query, search only those
  *    inverted lists. Corpus shuffles once on centroid id; at 100 TB the
  *    candidate set shrinks by ~n_lists/nprobe.
  *
  * Dot products fold left-to-right in double precision so results are
  * bit-identical across engines (oracle parity).
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"

  private def prepared(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm2", expr("aggregate(v, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))

  /** Exact top-k cosine neighbors for every query vector
    * (vec_id ≡ 0 mod 100 — a deterministic query workload). */
  def knnBruteForce(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = prepared(spark, dir)
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("norm2").as("na2"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("norm2").as("nb2"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))

    corpus.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Fns.money(expr(dotExpr) / sqrt(col("na2") * col("nb2"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-dimension mean centroid per label — stands in for k-means
    * coarse quantizers (the fixture's `label` IS the cluster id).
    * Components are money-rounded so centroid doubles are
    * engine-portable despite order-dependent averaging. */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(Fns.money(Fns.sumMoney(Fns.money(col("x").cast("double"))) / count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("centroid"))

  /** IVF probe search: route each query to its `nprobe` closest centroids
    * (by rounded cosine), then exact top-k within those lists only. */
  def knnIvf(spark: SparkSession, dir: String, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val e = prepared(spark, dir)
    val cent = centroids(spark, dir)
      .withColumn("cnorm2", expr("aggregate(centroid, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))

    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("norm2").as("na2"))

    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label"))
    val probes = queries.crossJoin(broadcast(cent))
      .withColumn("vb", col("centroid"))
      .withColumn("ccos", Fns.money(expr(dotExpr) / sqrt(col("na2") * col("cnorm2"))))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("va"), col("na2"), col("label"))

    val corpus = e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("norm2").as("nb2"), col("label"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), Seq("label"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Fns.money(expr(dotExpr) / sqrt(col("na2") * col("nb2"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
