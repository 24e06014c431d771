package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Properties of the sampling/election operators the oracle diff cannot
  * see: the canonical-doc election is a true argmax within each cluster,
  * the hash sample is the exact bottom-k (not just any k rows), and the
  * bounded-heap sample plan never window-sorts the corpus. */
class SampleElectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("canonicalDocs: one survivor per cluster, and it is the argmax(n_chars, -doc_id)") {
    val rows = Dedup.canonicalDocs(spark, dir).collect()
    val chars = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == chars.keySet) // every doc classified
    val byCluster = rows.groupBy(_.getLong(1))
    for ((_, members) <- byCluster) {
      val keeps = members.filter(_.getInt(4) == 1)
      assert(keeps.length == 1) // exactly one survivor
      val expected = members.map(_.getLong(0)).minBy(id => (-chars(id), id))
      assert(keeps.head.getLong(0) == expected)
      // kept_doc_id column agrees on every member row
      assert(members.forall(_.getLong(3) == expected))
      assert(members.head.getLong(2) == members.length) // cluster_size
    }
  }

  test("groupSample: exact bottom-5-by-hash per stratum, ranks contiguous") {
    val got = TextAnalysis.groupSample(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2), r.getLong(3)))
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("doc_id")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    def h52(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16)
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (ls, rows) =>
      rows.map(_._2).sortBy(id => (h52(id), id)).take(5)
        .zipWithIndex.map { case (id, i) => (ls, i + 1, id) }
    }.toSet
    assert(got.toSet == expected)
    // ranks are 1..n with no gaps inside each stratum
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
    }
  }

  test("groupSample plan: bounded-heap aggregate, no window sort of the corpus") {
    val plan = TextAnalysis.groupSample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_by"))
    assert(!plan.contains("Window"))
  }

  test("topDocsList: joined string is the 3 longest docs, longest first") {
    val got = TextAnalysis.topDocsList(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getLong(3)))
    val expected = docs.groupBy(_._1).map { case (ls, rows) =>
      ls -> rows.sortBy(t => (-t._3, t._2)).take(3).map(_._2).mkString(",")
    }
    assert(got == expected)
  }
}
