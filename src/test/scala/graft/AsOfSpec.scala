package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest right ≤ left, inclusive at equality, null before first") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any right row → null
      (2L, 10L, ts("2024-01-01 01:00:00")), // equal to r1 → r1 (inclusive)
      (3L, 10L, ts("2024-01-01 02:30:00")), // between r1 and r2 → r1
      (4L, 10L, ts("2024-01-01 05:00:00")), // after r2 → r2
      (5L, 99L, ts("2024-01-01 09:00:00"))  // key with no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 01:00:00")),
      (200L, 10L, ts("2024-01-01 03:00:00"))
    ).toDF("rid", "k", "rt")

    val out = AsOf.joinAsOf(left, right, "k", "t", "rt",
        Map("rid" -> "matched_rid"))
      .orderBy("id").collect()
    val got = out.map(r =>
      if (r.isNullAt(r.fieldIndex("matched_rid"))) -1L
      else r.getAs[Long]("matched_rid"))
    assert(got.sameElements(Array(-1L, 100L, 100L, 200L, -1L)))
  }

  test("numeric tie-break at equal (key, ts): version 10 beats version 9") {
    // "9" > "10" lexicographically — a string-cast tie-break would carry
    // the OLD version's payload; the natural numeric order must win
    val left = Seq((1L, 10L, ts("2024-01-01 02:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (9L, 10L, ts("2024-01-01 01:00:00"), "old"),
      (10L, 10L, ts("2024-01-01 01:00:00"), "new")
    ).toDF("version", "k", "rt", "payload")
    val out = AsOf.joinAsOf(left, right, "k", "t", "rt",
      Map("payload" -> "p"), rightTieBreak = Some("version")).collect()
    assert(out.length == 1 && out(0).getAs[String]("p") == "new")
  }

  test("as-of join preserves left row count (left-outer semantics)") {
    val ev = Tables.events(spark, sf)
    val out = graft.queries.Extras.eventsAsOfSignup(spark, sf)
    assert(out.count() == ev.count())
    // signup events match themselves (inclusive semantics)
    val selfMatched = out.as("o")
      .join(ev.filter(col("event_type") === "signup").as("e"),
        col("o.event_id") === col("e.event_id"))
      .filter(col("o.last_signup_event_id") =!= col("o.event_id"))
    assert(selfMatched.count() == 0)
  }
}
