package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming windowed agg matches the batch twin on the same data") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:50:00"), 2, "view", 2.0),
      Ev(3, ts("2024-01-01 01:05:00"), 1, "click", 3.0),
      Ev(4, ts("2024-01-01 01:59:00"), 3, "view", 4.0),
      Ev(5, ts("2024-01-01 02:00:00"), 1, "view", 5.0))
    input.addData(events)

    val q = EventStream.startMemorySink(
      EventStream.windowedCounts(input.toDF()), "win_test")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_test")
      .select("window_start", "event_type", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventStream.windowedCounts(events.toDF())
      .select("window_start", "event_type", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.size == 4) // (00h view), (01h click), (01h view), (02h view)
  }

  test("stateful user counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.userRunningCounts(spark, input.toDF())
      .writeStream.outputMode("update").format("memory")
      .queryName("user_state").start()

    input.addData(Ev(1, ts("2024-01-01 00:00:00"), 7, "view", 1.0))
    q.processAllAvailable()
    input.addData(Ev(2, ts("2024-01-01 00:05:00"), 7, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("user_state")
      .filter(col("user_id") === 7).orderBy(col("n_events").desc).head()
    assert(last.getAs[Long]("n_events") == 2L)
    assert(last.getAs[Timestamp]("last_ts") == ts("2024-01-01 00:05:00"))
  }

  test("streaming dedup drops re-delivered events across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.dedupedEvents(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    val e1 = Ev(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0)
    val e2 = Ev(2, ts("2024-01-01 00:01:00"), 2, "view", 2.0)
    input.addData(e1, e2, e1) // dup within batch
    q.processAllAvailable()
    input.addData(e1, e2)     // dup across batches (within watermark)
    input.addData(Ev(3, ts("2024-01-01 00:02:00"), 3, "view", 3.0))
    q.processAllAvailable()
    // advance event time far past the watermark so all rows flush
    input.addData(Ev(99, ts("2024-01-01 09:00:00"), 9, "view", 9.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 99L)))
  }

  test("file-source stream over the events fixture produces the batch result") {
    val batchDf = Tables.events(spark, sf)
    // file stream sources need a directory; stage the single fixture file
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    val stream = EventStream.readEventsStream(spark, dir.toString, raw.schema)
    // ts arrives as ns-long in the raw file only when nanosAsLong applies;
    // the fixture path feeds the raw schema, so normalize like Tables.events
    val normalized = if (stream.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else stream
    val q = EventStream.startMemorySink(
      EventStream.windowedCounts(normalized), "file_win")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("file_win").agg(sum("n_events")).head().getLong(0)
    assert(streamed == batchDf.count())
  }
}

class FlatMapGroupsSpec extends SparkSpec {
  test("flatMapGroupsWithState emits a closed session once the watermark passes the gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = graft.streaming.EventStream
      .closedSessions(spark, input.toDF(), gapMs = 30L * 60 * 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("closed_sessions").start()
    input.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 00:00:00"), 42, "view", 1.0),
      Ev(2, Timestamp.valueOf("2024-01-01 00:01:00"), 42, "click", 1.0))
    q.processAllAvailable()
    // event far in the future advances the watermark past 00:31 → user 42's
    // session times out on the following batch
    input.addData(Ev(3, Timestamp.valueOf("2024-01-01 05:00:00"), 7, "view", 1.0))
    q.processAllAvailable()
    input.addData(Ev(4, Timestamp.valueOf("2024-01-01 05:01:00"), 7, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("closed_sessions")
      .filter(col("user_id") === 42).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Timestamp]("last_ts") == Timestamp.valueOf("2024-01-01 00:01:00"))
  }
}
