package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join is result-identical to the plain equi-join") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("type_code", Fns.h64(col("event_type")))
    val salted = SkewJoin.salted(ev, dim, "event_type", col("event_id"), salts = 8)
      .orderBy(col("event_id")).collect().toSeq
    val plain = ev.join(dim, Seq("event_type"))
      .orderBy(col("event_id")).collect().toSeq
    assert(salted.nonEmpty && salted == plain)
  }

  test("salting spreads a single hot key across all salt buckets") {
    // every row shares ONE key — the exact shape that melts one reducer;
    // the salt must fan it out to `salts` distinct shuffle keys
    val hot = Tables.events(spark, sf)
      .select(col("event_id"), lit("hot").as("k"))
    val buckets = hot
      .withColumn("__salt", pmod(hash(col("event_id")), lit(8)))
      .select(col("__salt")).distinct().count()
    assert(buckets == 8L, s"expected 8 salt buckets, got $buckets")
  }

  test("shuffle_hash-hinted salted join exercises the shuffle path, not broadcast") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = ev.select(col("event_type")).distinct()
    val plan = SkewJoin.salted(ev, dim.hint("shuffle_hash"), "event_type",
      col("event_id"), salts = 8)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("ShuffledHashJoin"), plan)
    // and the salt is part of the join key, so the hot key's rows land
    // on `salts` reducers instead of one
    assert(plan.contains("__salt"), plan)
  }
}
