package graft

import graft.core.Typed
import graft.core.Typed.{Registration, VoterId}
import graft.operators.Components

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed view over a conformed component, with typed filtering") {
    val src = Seq(
      ("2020-01-01", "NA"),
      ("2018-05-05", "2021-02-02"),
      ("2019-03-03", "NA")).toDF("reg", "cancel")
    val conformed = Components.conform(src,
      Seq("registr_dt", "cancellation_dt"),
      Map("registr_dt" -> "reg", "cancellation_dt" -> "cancel"))
    val ds = Typed.as[Registration](conformed)
    val active = Typed.activeRegistrations(ds).collect()
    assert(active.length == 2)
    assert(active.forall(!_.isCancelled))
  }

  test("typed view rejects mismatched component schemas at analysis") {
    val wrong = Seq(("a", "b")).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      Typed.as[VoterId](wrong).collect()
    }
  }

  test("manifest diff: only unprocessed keys survive") {
    val current = Seq("a.zip", "b.zip", "c.zip").toDF("key")
    val processed = Seq("a.zip").toDF("key")
    val out = graft.sources.Listing.newKeys(current, processed)
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("b.zip", "c.zip"))
  }

  test("streaming dedup within watermark drops in-window duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[graft.streaming.EventStreams.Event]
    val q = graft.streaming.EventStreams
      .dedupWithinWatermark(input.toDF(), Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData(
      graft.streaming.EventStreams.Event(1, ts, 7, "click", 1.0),
      graft.streaming.EventStreams.Event(1, ts, 7, "click", 1.0),
      graft.streaming.EventStreams.Event(2, ts, 8, "view", 2.0))
    q.processAllAvailable()
    val n = spark.table("dedup_stream").count()
    q.stop()
    assert(n == 2)
  }
}
