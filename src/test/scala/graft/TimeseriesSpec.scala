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
}
