package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Replay-vs-batch differential harness: every stateful streaming
  * operator is replayed over the REAL events fixture via MemoryStream
  * (time-ordered micro-batches — the shape a watermark contract
  * guarantees nothing is dropped under) and its accumulated output is
  * asserted EQUAL to the batch formulation over the same rows. This
  * puts watermark semantics, window finalization, and interval-join
  * state eviction under the same differential discipline as the
  * DuckDB-oracled batch queries (which cannot see streaming state
  * machinery).
  */
class StreamingDifferentialSpec extends SparkSpec {
  import spark.implicits._

  /** First 600 fixture events, time-ordered, in 3 consecutive chunks.
    * Within a chunk order is irrelevant (the watermark only advances
    * between micro-batches), so chunks are reversed to prove it. */
  private lazy val chunks: Seq[Seq[Event]] = {
    val evs = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq.sortBy(_.ts.getTime).take(600)
    evs.grouped(200).map(_.reverse).toSeq
  }
  private lazy val allEvents: Seq[Event] = chunks.flatten

  /** Far-future event that pushes the watermark past every fixture
    * window so Append mode finalizes them; excluded from comparisons. */
  private val flusher =
    Event(-1L, Timestamp.valueOf("2024-06-01 00:00:00"), -1L, "flush", 0.0)

  test("windowedTypeStats replay equals the batch window aggregation") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedTypeStats(input.toDF(),
      watermarkDelay = "10 minutes", windowLength = "1 hour")
      .writeStream.format("memory").queryName("diff_win")
      .outputMode(OutputMode.Append).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    input.addData(flusher); q.processAllAvailable()
    q.stop()

    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6)) // sums accumulate in different
    }.toSet                               // orders stream-vs-batch
    val streamed = canon(spark.table("diff_win")
      .filter(col("event_type") =!= "flush").collect())
    val batch = canon(EventStreams.windowedTypeStats(allEvents.toDF())
      .collect())
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dedupWithinWatermark replay equals batch dropDuplicates") {
    implicit val sc = spark.sqlContext
    // inject a duplicate of every 10th event in its own micro-batch
    // (arrival inside the watermark window — the contract's domain)
    val withDups = chunks.map(c => c ++ c.filter(_.event_id % 10 == 0))
    val input = MemoryStream[Event]
    val q = EventStreams.dedupWithinWatermark(input.toDF(),
      keyCols = Seq("event_id"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("diff_dedup")
      .outputMode(OutputMode.Append).start()
    withDups.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("diff_dedup").as[Event].collect().toSet
    val batch = withDups.flatten.toDF().dropDuplicates("event_id")
      .as[Event].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == allEvents.size) // dups actually dropped
  }

  test("intervalJoin replay equals the batch range join") {
    implicit val sc = spark.sqlContext
    val left = MemoryStream[Event]
    val right = MemoryStream[Event]
    def rightDf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id").as("r_event_id"), col("ts").as("r_ts"),
        col("user_id"), col("event_type").as("r_type"),
        col("value").as("r_value"))
    val joined = EventStreams.intervalJoin(
      left.toDF().filter(col("event_type") === "click"),
      rightDf(right.toDF()).filter(col("r_type") === "purchase"),
      keyCols = Seq("user_id"), leftTs = "ts", rightTs = "r_ts",
      windowSeconds = 24 * 3600, watermarkDelay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("diff_ij")
      .outputMode(OutputMode.Append).start()
    chunks.foreach { c =>
      left.addData(c); right.addData(c); q.processAllAvailable()
    }
    left.addData(flusher); right.addData(flusher); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("diff_ij")
      .filter(col("user_id") >= 0) // drop any flusher self-pair
      .select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    val batchL = allEvents.toDF().filter(col("event_type") === "click")
    val batchR = rightDf(allEvents.toDF()).filter(col("r_type") === "purchase")
    val batch = batchL.join(batchR,
        batchL("user_id") === batchR("user_id") &&
          col("r_ts") >= col("ts") &&
          col("r_ts") < col("ts") + expr("INTERVAL 86400 SECONDS"))
      .select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("windowedCountMin replay equals the batch sketch of each window's rows") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedCountMin(
      input.toDF().select(col("ts"), col("event_type").as("tok")),
      "ts", "tok", d = 3, w = 64,
      watermarkDelay = "10 minutes", windowLength = "1 hour")
      .writeStream.format("memory").queryName("diff_cms")
      .outputMode(OutputMode.Append).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    input.addData(flusher); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("diff_cms")
      .filter(col("window_start") < Timestamp.valueOf("2024-05-01 00:00:00"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // batch: per epoch-aligned hour window, the batch countMin of that
    // window's rows (hour windows align to epoch in any timezone)
    val perWindow = allEvents.groupBy(e =>
      e.ts.getTime - Math.floorMod(e.ts.getTime, 3600L * 1000))
    val expected = perWindow.toSeq.flatMap { case (ws, evs) =>
      graft.operators.Sketches.countMin(
        evs.map(_.event_type).toDF("tok"), "tok", d = 3, w = 64)
        .collect().map(r => (ws, r.getInt(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("passageDedupStream: survivors = batch winners when ids ascend with time") {
    implicit val sc = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // k=3 passages; doc 3 repeats doc 1's first passage, doc 4 is a full
    // duplicate of doc 2 — duplicates arrive in LATER micro-batches
    val batches: Seq[Seq[(Long, Timestamp, String)]] = Seq(
      Seq((1L, t(0), "a b c d e f"), (2L, t(1), "g h i")),
      Seq((3L, t(10), "a b c x y z"), (4L, t(11), "g h i")),
      Seq((5L, t(20), "fresh words only"))
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.passageDedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      "ts", k = 3, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("diff_pd")
      .outputMode(OutputMode.Append).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val survivors = spark.table("diff_pd")
      .select("doc_id", "pos", "passage")
      .as[(Long, Int, String)].collect().toSet
    // batch winners: global first occurrence by (doc_id, pos) — equal to
    // arrival order here because ids ascend with event time
    assert(survivors == Set(
      (1L, 0, "a b c"), (1L, 1, "d e f"),
      (2L, 0, "g h i"),
      (3L, 1, "x y z"),
      (5L, 0, "fresh words only")))
    // and the batch operator reassembles exactly these survivors
    val batchTexts = graft.operators.Dedup.passageDedup(
      batches.flatten.toDF("doc_id", "ts", "text"), "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toMap
    assert(batchTexts == Map(1L -> "a b c d e f", 2L -> "g h i",
      3L -> "x y z", 5L -> "fresh words only"))
  }

  test("retentionStream replay equals the batch retention triangle") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[EventStreams.RetEvent]
    val q = EventStreams.retentionStream(input.toDS(),
        watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("diff_ret")
      .outputMode(OutputMode.Append).start()
    chunks.foreach { c =>
      input.addData(c.map(e => EventStreams.RetEvent(e.user_id, e.ts)))
      q.processAllAvailable()
    }
    q.stop()
    // emissions are unique per (user, offset), so the triangle is a
    // plain count — compare against the batch operator on the same rows
    val streamed = spark.table("diff_ret")
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_active"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val batch = graft.operators.Timeseries.retentionCohorts(
        allEvents.toDF().select(col("user_id"), col("ts")),
        "user_id", "ts", "week")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(streamed.map(_._1).size > 0 && streamed.exists(_._2 > 0),
      "fixture slice must span multiple weeks")
  }
}
