package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Timeseries

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill: dense grid, forward-filled values, gaps flagged") {
    val events = Seq(
      (7L, ts("2024-01-01 10:15:00"), 1.0),
      (7L, ts("2024-01-01 10:45:00"), 2.0),
      // 11:00 empty -> filled with 3.0
      (7L, ts("2024-01-01 12:05:00"), 5.0),
      (8L, ts("2024-01-01 09:30:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFill(events, Seq("user_id"), "ts",
        sum(col("value")), unit = "hour")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (7L, "2024-01-01 10:00:00.0", 3.0, false),
      (7L, "2024-01-01 11:00:00.0", 3.0, true),
      (7L, "2024-01-01 12:00:00.0", 5.0, false),
      (8L, "2024-01-01 09:00:00.0", 4.0, false)))
  }

  test("gapFill: day unit spans calendar days per key") {
    val events = Seq(
      (1L, ts("2024-03-01 23:59:00"), 1.0),
      (1L, ts("2024-03-04 00:01:00"), 9.0)
    ).toDF("k", "ts", "value")
    val out = Timeseries.gapFill(events, Seq("k"), "ts",
        sum(col("value")), unit = "day")
      .orderBy("bucket")
      .collect().map(r => (r.getTimestamp(1).toString.take(10),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("2024-03-01", 1.0, false), ("2024-03-02", 1.0, true),
      ("2024-03-03", 1.0, true), ("2024-03-04", 9.0, false)))
  }

  test("retentionCohorts: first active week anchors each entity's cohort") {
    // user 1 starts week of Jan 1 (Mon), returns 2 weeks later;
    // user 2 starts week of Jan 8, returns the next week;
    // user 3 only ever appears in week of Jan 8
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-17 09:00:00")),
      (2L, ts("2024-01-10 08:00:00")), (2L, ts("2024-01-15 20:00:00")),
      (3L, ts("2024-01-12 07:00:00"))
    ).toDF("user_id", "ts")
    val out = Timeseries.retentionCohorts(events, "user_id", "ts", "week")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 2L, ("2024-01-08", 1) -> 1L))
  }

  test("retentionCohorts: multiple events in one bucket count once") {
    val events = Seq(
      (1L, ts("2024-02-01 10:00:00")), (1L, ts("2024-02-01 11:00:00")),
      (1L, ts("2024-02-02 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Timeseries.retentionCohorts(events, "user_id", "ts", "day")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(("2024-02-01", 0) -> 1L, ("2024-02-01", 1) -> 1L))
  }

  test("retentionCohorts: rejects units without a fixed day width") {
    intercept[IllegalArgumentException] {
      Timeseries.retentionCohorts(
        Seq((1L, ts("2024-02-01 10:00:00"))).toDF("user_id", "ts"),
        "user_id", "ts", "month")
    }
  }
}
