package graft

import org.apache.spark.sql.functions._
import graft.engine.{ExtractLoad, Layers, Scd2, XmlShred}
import graft.queries.Scd2Queries
import java.nio.file.Files

class Scd2Spec extends SparkSpec {

  test("initial load: one current version per key, contiguous surrogates") {
    val dim = Scd2Queries.initial(spark, sf)
    val n = dim.count()
    assert(dim.filter(col("is_current")).count() == n)
    assert(dim.filter(col("expiry_date").isNotNull).count() == 0)
    val sks = dim.select("surrogate_key").collect().map(_.getLong(0)).sorted
    assert(sks.head == 1L && sks.last == n && sks.distinct.length == n.toInt)
  }

  test("upsert: ≤1 current version per business key; changed keys expired") {
    val dim = Scd2Queries.upsert(spark, sf)
    val perKey = dim.filter(col("is_current"))
      .groupBy("part_key").count().filter(col("count") > 1)
    assert(perKey.count() == 0)
    // every changed key (part_key % 7 == 0) has exactly one expired and one new version
    val changed = dim.filter(col("part_key") % 7 === 0 && col("part_key") < 1000000)
    val expired = changed.filter(!col("is_current"))
    val fresh = changed.filter(col("is_current"))
    assert(expired.count() == fresh.count())
    assert(expired.filter(col("expiry_date") =!= to_date(lit("2024-06-01"))).count() == 0)
    assert(fresh.filter(col("effective_date") =!= to_date(lit("2024-06-01"))).count() == 0)
  }

  test("upsert twice with same source is idempotent on version count") {
    val d1 = Scd2Queries.upsert(spark, sf)
    val d2 = Scd2.applyChanges(d1, Scd2Queries.secondSource(spark, sf),
      Scd2Queries.cfg, "2024-07-01")
    assert(d2.count() == d1.count()) // no-op load adds nothing
  }

  test("multi-row-per-key batch: recencyCol picks the latest, invariant holds") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"), "sk", recencyCol = Some("updated_at"))
    val initial = Scd2.initialLoad(
      Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"))
        .toDF("k", "attr", "updated_at"), cfg, "2024-01-01")
    // one micro-batch carrying THREE updates to key 1 — latest must win,
    // and only one current version may remain
    val batch = Seq(
      (1L, "v1", "2024-02-01"), (1L, "v3", "2024-02-03"), (1L, "v2", "2024-02-02"))
      .toDF("k", "attr", "updated_at")
    val next = Scd2.applyChanges(initial, batch, cfg, "2024-02-04")
    val cur = next.filter(col("is_current") && col("k") === 1L).collect()
    assert(cur.length == 1)
    assert(cur(0).getAs[String]("attr") == "v3")
    // total versions for key 1: the expired initial + one new (not three)
    assert(next.filter(col("k") === 1L).count() == 2)
  }

  test("snapshotAsOf time-travels: old date sees v1, new date sees v2, one row per key") {
    val dim = Scd2Queries.upsert(spark, sf) // initial 2024-01-01, upsert 2024-06-01
    val cfg = Scd2Queries.cfg
    // BEFORE the upsert date: every key resolves to its original version
    val before = Scd2.snapshotAsOf(dim, cfg, "2024-03-01")
    assert(before.count() == Scd2Queries.initial(spark, sf).count())
    assert(before.filter(col("effective_date") > to_date(lit("2024-03-01"))).count() == 0)
    // AFTER: changed keys resolve to the new version, exactly one row/key
    val after = Scd2.snapshotAsOf(dim, cfg, "2024-07-01")
    val dupes = after.groupBy(col(cfg.businessKey)).count().filter(col("count") > 1)
    assert(dupes.count() == 0)
    val changedKey = after.filter(col("part_key") % 7 === 0 && col("part_key") < 1000000)
    assert(changedKey.filter(col("effective_date") =!= to_date(lit("2024-06-01"))).count() == 0)
  }

  test("gate: recency-ordered duplicates are NOT ambiguous; ties at max recency are") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"), "sk", recencyCol = Some("updated_at"))
    val initial = Scd2.initialLoad(
      Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"))
        .toDF("k", "attr", "updated_at"), cfg, "2024-01-01")
    // three updates to key 1, strictly ordered by recency: latest is
    // well-defined, the gate must NOT flag ambiguity
    val ordered = Seq(
      (1L, "v1", "2024-02-01"), (1L, "v3", "2024-02-03"), (1L, "v2", "2024-02-02"))
      .toDF("k", "attr", "updated_at")
    val okRows = Scd2.gate(initial, ordered, cfg, maxExpirePct = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(okRows("ambiguous_latest") == 0)
    // two DIFFERENT attrs tied at the same max recency: undefined latest
    val tied = Seq(
      (1L, "x", "2024-02-01"), (1L, "y", "2024-02-01"))
      .toDF("k", "attr", "updated_at")
    val tiedRows = Scd2.gate(initial, tied, cfg, maxExpirePct = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tiedRows("ambiguous_latest") == 1)
    // an OLD duplicate under a distinct newer row is fine — ambiguity
    // only counts where it decides the winner
    val oldTie = Seq(
      (1L, "x", "2024-02-01"), (1L, "y", "2024-02-01"), (1L, "z", "2024-02-02"))
      .toDF("k", "attr", "updated_at")
    val oldTieRows = Scd2.gate(initial, oldTie, cfg, maxExpirePct = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(oldTieRows("ambiguous_latest") == 0)
  }

  test("gateBatches: per-batch numbers are isolated and match single-batch gates") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"), "sk")
    val initial = Scd2.initialLoad(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "attr"),
      cfg, "2024-01-01")
    val good = Seq((1L, "A")).toDF("k", "attr")                  // 25% expire
    val bad = Seq((1L, "x"), (1L, "y")).toDF("k", "attr")        // ambiguous
    val both = Scd2.gateBatches(initial, Seq("good" -> good, "bad" -> bad),
      cfg, maxExpirePct = 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(both(("good", "ambiguous_latest")) == 0)
    assert(both(("good", "expire_blast_radius")) == 0)
    assert(both(("bad", "ambiguous_latest")) == 1)
    // the fused single-job report must equal the one-batch gate rows
    for ((tag, b) <- Seq("good" -> good, "bad" -> bad)) {
      val single = Scd2.gate(initial, b, cfg, maxExpirePct = 50)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      single.foreach { case (rule, v) => assert(both((tag, rule)) == v,
        s"batch $tag rule $rule: fused=${both((tag, rule))} single=$v") }
    }
  }

  test("gateBatches rejects duplicate batch tags — per-batch attribution would silently merge") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"), "sk")
    val initial = Scd2.initialLoad(Seq((1L, "a")).toDF("k", "attr"), cfg, "2024-01-01")
    val b = Seq((1L, "A")).toDF("k", "attr")
    val e = intercept[IllegalArgumentException] {
      Scd2.gateBatches(initial, Seq("t" -> b, "t" -> b), cfg)
    }
    assert(e.getMessage.contains("duplicate batch tags"))
  }

  test("scd2 handles business/tracked column names containing dots") {
    import spark.implicits._
    // the generic Config contract allows any column name; the max_by
    // winner re-projection must resolve by field, not by string path
    val cfg = Scd2.Config("biz.key", Seq("the.attr"), "sk",
      recencyCol = Some("updated.at"))
    val src = Seq(
      (1L, "old", "2024-01-01"), (1L, "new", "2024-01-02"), (2L, "b", "2024-01-01"))
      .toDF("biz.key", "the.attr", "updated.at")
    val dim = Scd2.initialLoad(src, cfg, "2024-01-01")
    assert(dim.count() == 2)
    val kept = dim.filter(col("`biz.key`") === 1L).collect()(0)
    assert(kept.getAs[String]("the.attr") == "new") // latest by recency won
  }

  test("applyChangesGated: reject leaves the dimension untouched, promote merges") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"), "sk")
    val initial = Scd2.initialLoad(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "attr"),
      cfg, "2024-01-01")
    // 3 of 4 keys changed = 75% blast radius: rejected at the 50% cap
    val fatFinger = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "d")).toDF("k", "attr")
    val (promoted1, dim1, report1) =
      Scd2.applyChangesGated(initial, fatFinger, cfg, "2024-02-01", maxExpirePct = 50)
    assert(!promoted1)
    assert(dim1.collect().toSet == initial.collect().toSet)
    val r1 = report1.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r1("expire_blast_radius") == 3)
    // the same batch promotes once the operator raises the cap
    val (promoted2, dim2, _) =
      Scd2.applyChangesGated(initial, fatFinger, cfg, "2024-02-01", maxExpirePct = 80)
    assert(promoted2)
    assert(dim2.filter(col("is_current")).count() == 4)
    assert(dim2.count() == 7) // 4 initial + 3 new versions
  }

  test("gate max(sk) scans ALL versions: expired-row max sk mints no colliding keys") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"), "sk")
    // hand-built dim (NOT an engine output): the max sk (9) sits on an
    // EXPIRED row — the round-10 ADVICE scenario where the gate's old
    // current-only harvest returned 3 and the promoted merge minted
    // sk=4 colliding with nothing current but breaking key uniqueness
    val dim = Seq(
      (9L, 1L, "v1", "2024-01-01", "2024-02-01", false),
      (2L, 1L, "v2", "2024-02-01", null, true),
      (3L, 2L, "w", "2024-01-01", null, true))
      .toDF("sk", "k", "attr", "eff", "exp", "is_current")
      .withColumn("attr_hash", Scd2.attrHash(Seq("attr")))
      .withColumn("effective_date", to_date(col("eff")))
      .withColumn("expiry_date", to_date(col("exp")))
      .drop("eff", "exp")
    val batch = Seq((5L, "new")).toDF("k", "attr")
    val (promoted, merged, _) =
      Scd2.applyChangesGated(dim, batch, cfg, "2024-03-01")
    assert(promoted)
    val sks = merged.select(col("sk")).collect().map(_.getLong(0))
    assert(sks.length == sks.distinct.length,
      s"colliding surrogate keys: ${sks.sorted.mkString(",")}")
    assert(sks.max == 10L, "new version must continue after the EXPIRED max sk 9")
  }

  test("assignIds matches global row_number ordering") {
    val df = Tables.part(spark, sf).select(col("p_partkey"))
    val ids = Scd2.assignIds(df, "p_partkey", "id")
      .orderBy("p_partkey").collect().map(_.getLong(1))
    assert(ids.sameElements(1L to ids.length.toLong))
  }
}

class ExtractLoadSpec extends SparkSpec {

  test("checkpoint lifecycle: full load then empty incremental then new data") {
    val tmp = Files.createTempDirectory("el").toString
    val ckpt = s"$tmp/ckpt"
    val out = s"$tmp/bronze"
    val ev = Tables.events(spark, sf)

    // run 1: no checkpoint → full load
    val n1 = ExtractLoad.run(spark, ev, "events", "event_id", "ts", ckpt, out, "2024-02-01")
    assert(n1 == ev.count())
    val c1 = ExtractLoad.readCheckpoint(spark, ckpt).get
    assert(c1.last_id == ev.agg(max("event_id")).head().getLong(0))

    // run 2: watermark is max(ts) → nothing new, checkpoint untouched
    val n2 = ExtractLoad.run(spark, ev, "events", "event_id", "ts", ckpt, out, "2024-02-02")
    assert(n2 == 0)

    // run 3: later data arrives → only new rows appended
    val later = ev.withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
      .withColumn("event_id", col("event_id") + lit(1000000))
    val n3 = ExtractLoad.run(spark, later, "events", "event_id", "ts", ckpt, out, "2024-02-03")
    assert(n3 == ev.count())
    val total = spark.read.parquet(out).count()
    assert(total == 2 * ev.count())
    // partition pruning by ingestion_date works
    val d3 = spark.read.parquet(out).filter(col("ingestion_date") === "2024-02-03")
    assert(d3.count() == n3)
  }

  test("gated promotion end-to-end: violating batch writes NOTHING and the watermark does not advance; repaired batch then promotes") {
    import graft.engine.{DataQuality => DQ}
    val tmp = Files.createTempDirectory("elg").toString
    val ckpt = s"$tmp/ckpt"
    val out = s"$tmp/bronze"
    val ev = Tables.events(spark, sf)
    val rules = Seq(DQ.NotNull("event_id"), DQ.Unique("event_id"))

    // batch 1: nulls injected → every effect of promotion must be absent
    val tainted = ev.withColumn("event_id",
      when(pmod(col("event_id"), lit(50)) === 0, lit(null).cast("long"))
        .otherwise(col("event_id")))
    val (n1, rep1) = ExtractLoad.runGated(spark, tainted, "events",
      "event_id", "ts", ckpt, out, "2024-02-01", rules)
    assert(n1 == 0)
    assert(rep1.filter(col("promoted")).count() == 0)
    assert(rep1.filter(col("rule") === "not_null_event_id" && !col("passed")).count() == 1)
    assert(!new java.io.File(out).exists(), "rejected batch must not write bronze")
    assert(ExtractLoad.readCheckpoint(spark, ckpt).isEmpty,
      "rejected batch must not advance the watermark")

    // batch 2: the repaired source promotes from the SAME (unmoved) watermark
    val (n2, rep2) = ExtractLoad.runGated(spark, ev, "events",
      "event_id", "ts", ckpt, out, "2024-02-01", rules)
    assert(n2 == ev.count())
    assert(rep2.filter(!col("promoted")).count() == 0)
    assert(spark.read.parquet(out).count() == ev.count())
    assert(ExtractLoad.readCheckpoint(spark, ckpt).get.last_id ==
      ev.agg(max("event_id")).head().getLong(0))

    // batch 3: clean but EMPTY delta → count gate holds (no promote, no write)
    val (n3, _) = ExtractLoad.runGated(spark, ev, "events",
      "event_id", "ts", ckpt, out, "2024-02-02", rules)
    assert(n3 == 0)
  }

  test("watermark monotonicity: re-extract excludes rows ≤ watermark") {
    val ev = Tables.events(spark, sf)
    val ck = ExtractLoad.Checkpoint("events", 0L,
      "2024-01-05 00:00:00.000000", "2024-01-05 00:00:00.000000")
    val inc = ExtractLoad.incremental(ev, "event_id", "ts", Some(ck))
    assert(inc.filter(col("ts") <= to_timestamp(lit(ck.last_event_time))).count() == 0)
  }
}

class XmlShredSpec extends SparkSpec {
  test("round-trip: shredded fields equal source attributes") {
    val out = XmlShred.shred(spark, sf)
    val src = Tables.customer(spark, sf)
    assert(out.count() == src.count())
    val joined = out.join(src, out("customer_key") === src("c_custkey"))
    assert(joined.filter(col("segment") =!= col("c_mktsegment")).count() == 0)
    assert(joined.filter(col("nation_key") =!= col("c_nationkey")).count() == 0)
  }

  test("13-field shred: typed round-trip lossless, missing element parses to null") {
    val out = XmlShred.shredFull(spark, sf)
    val src = Tables.customer(spark, sf)
    assert(out.count() == src.count())
    // typed fields survive the XML round-trip
    import org.apache.spark.sql.types._
    val t = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(t("total_purchase_ytd") == DoubleType)
    assert(t("date_first_purchase") == DateType && t("birth_date") == DateType)
    assert(t("total_children") == IntegerType && t("home_owner_flag") == IntegerType)
    // the double is bit-identical to the source column
    val j = out.join(src, out("customer_key") === src("c_custkey"))
    assert(j.filter(col("total_purchase_ytd") =!= col("c_acctbal")).count() == 0)
    // every 7th customer omits CommuteDistance → null; all others non-null
    assert(out.filter(col("customer_key") % 7 === 0)
      .filter(col("commute_distance").isNotNull).count() == 0)
    assert(out.filter(col("customer_key") % 7 =!= 0)
      .filter(col("commute_distance").isNull).count() == 0)
  }
}

class LayersSpec extends SparkSpec {
  test("medallion flow: bronze append → CTAS mart → catalog scan") {
    val s2 = spark
    Layers.createAll(s2)
    val df = Tables.orders(s2, sf).withColumn("ingestion_date", to_date(lit("2024-01-01")))
    Layers.overwrite(df, "bronze.orders_t")
    assert(Layers.table(s2, "bronze.orders_t").count() == df.count())
    Layers.ctas(s2, "mart.order_counts",
      "SELECT o_orderstatus, count(*) AS n FROM bronze.orders_t GROUP BY 1")
    assert(Layers.table(s2, "mart.order_counts").count() > 0)
    s2.sql("DROP TABLE mart.order_counts")
    s2.sql("DROP TABLE bronze.orders_t")
  }

  test("replacePartitions: re-running a load is a no-op, other partitions untouched") {
    Layers.createAll(spark)
    val base = Tables.orders(spark, sf).limit(100)
    val d1 = base.withColumn("ingestion_date", to_date(lit("2024-01-01")))
    val d2 = base.withColumn("ingestion_date", to_date(lit("2024-01-02")))
    Layers.replacePartitions(d1, "bronze.orders_rp")
    Layers.replacePartitions(d2, "bronze.orders_rp")
    val twoDays = Layers.table(spark, "bronze.orders_rp").count()
    assert(twoDays == 200)
    // re-run day 2 (the reference's append defect would make this 300)
    Layers.replacePartitions(d2, "bronze.orders_rp")
    assert(Layers.table(spark, "bronze.orders_rp").count() == twoDays)
    // day 2 redelivered with fewer rows: only that partition changes
    Layers.replacePartitions(d2.limit(40), "bronze.orders_rp")
    val byDay = Layers.table(spark, "bronze.orders_rp")
      .groupBy("ingestion_date").count()
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    assert(byDay("2024-01-01") == 100 && byDay("2024-01-02") == 40)
    spark.sql("DROP TABLE bronze.orders_rp")
  }

  test("extract-load retry after lost checkpoint does not duplicate (idempotent batch)") {
    val tmp = java.nio.file.Files.createTempDirectory("idem").toString
    val ckpt = s"$tmp/ckpt"; val out = s"$tmp/bronze"
    val ev = Tables.events(spark, sf)
    val n1 = ExtractLoad.run(spark, ev, "events", "event_id", "ts", ckpt, out, "2024-02-01")
    assert(n1 == ev.count())
    // simulate "data written, checkpoint save lost" → the retry re-runs
    // the SAME work unit and must replace, not append
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    val n2 = ExtractLoad.run(spark, ev, "events", "event_id", "ts", ckpt, out, "2024-02-01")
    assert(n2 == n1)
    assert(spark.read.parquet(out).count() == ev.count())
  }

  test("retry across midnight: same work unit under a new ingestion date does not duplicate") {
    val tmp = java.nio.file.Files.createTempDirectory("idem2").toString
    val ckpt = s"$tmp/ckpt"; val out = s"$tmp/bronze"
    val ev = Tables.events(spark, sf)
    val n1 = ExtractLoad.run(spark, ev, "events", "event_id", "ts", ckpt, out, "2024-02-01")
    assert(n1 == ev.count())
    // checkpoint save lost; the scheduler retries AFTER midnight — same
    // work unit (batch_id), different ingestion_date. The old partial
    // partition must be dropped, not left to duplicate every row.
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    val n2 = ExtractLoad.run(spark, ev, "events", "event_id", "ts", ckpt, out, "2024-02-02")
    assert(n2 == n1)
    assert(spark.read.parquet(out).count() == ev.count())
  }

  test("createExternal: LOCATION table over existing files; DROP keeps the data") {
    Layers.createAll(spark)
    val tmp = java.nio.file.Files.createTempDirectory("ext").toString
    Tables.region(spark, sf).write.mode("overwrite").parquet(tmp)
    Layers.createExternal(spark, "bronze.region_ext", tmp)
    assert(Layers.table(spark, "bronze.region_ext").count() ==
      Tables.region(spark, sf).count())
    spark.sql("DROP TABLE bronze.region_ext")
    assert(spark.read.parquet(tmp).count() == Tables.region(spark, sf).count())
  }
}

class SchemaEvolutionSpec extends SparkSpec {
  test("append with new column: union schema visible via mergeSchema read") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("evo").toString
    val v1 = Tables.region(spark, sf)
    v1.write.mode("append").parquet(tmp)
    val v2 = Tables.region(spark, sf).withColumn("r_comment", lit("added-later"))
    v2.write.mode("append").parquet(tmp)
    val merged = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert(merged.columns.toSet == Set("r_regionkey", "r_name", "r_comment"))
    assert(merged.count() == v1.count() * 2)
    // old rows surface the evolved column as null
    assert(merged.filter(col("r_comment").isNull).count() == v1.count())
  }
}

class PrefixScanSpec extends SparkSpec {
  test("distributed exclusive scan equals the single-partition window cumsum") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 37 % 4999).toLong, (i % 13 + 1).toLong))
      .toDF("ord", "v")
    val scannedRows = graft.engine.Prefix.exclusiveScan(df, "ord", "v", "off")
      .select(col("ord"), col("off")).collect()
    assert(scannedRows.length == 5000)
    val scanned = scannedRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df.withColumn("off", coalesce(sum(col("v")).over(
        Window.orderBy(col("ord"), col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("ord"), col("off")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ord has duplicates (mod wrap) — compare only unambiguous keys
    val dupOrds = (1 to 5000).map(i => (i * 37 % 4999).toLong)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }.toSet
    assert(scanned.filterNot(kv => dupOrds(kv._1)) ==
      ref.filterNot(kv => dupOrds(kv._1)))
  }

  test("scan rejects a non-long value column up front and a null value with a named error") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val intCol = (1 to 10).map(i => (i.toLong, i)).toDF("ord", "v")
    val e = intercept[IllegalArgumentException] {
      graft.engine.Prefix.exclusiveScan(intCol, "ord", "v", "off")
    }
    assert(e.getMessage.contains("must be LongType"))
    val withNull = Seq((1L, Some(1L)), (2L, None), (3L, Some(3L))).toDF("ord", "v")
    val e2 = intercept[Exception] {
      graft.engine.Prefix.exclusiveScan(withNull, "ord", "v", "off").collect()
    }
    // surfaced from the executor wrapped in SparkException — walk the chain
    val msgs = Iterator.iterate[Throwable](e2)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("non-null required"), msgs)
  }

  test("scan sums to the dataset total and starts at zero") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i)).toDF("ord", "v")
    val out = graft.engine.Prefix.exclusiveScan(df, "ord", "v", "off")
    val last = out.orderBy(col("ord").desc).limit(1).collect()(0)
    assert(last.getAs[Long]("off") == (1L to 999L).sum)
    assert(out.orderBy(col("ord")).limit(1).collect()(0).getAs[Long]("off") == 0L)
  }
}
