package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}

import graft.core.SnapshotTable

/** The snapshot CDC source end-to-end through REAL streaming queries —
  * version-number offsets over the stored change feed, the loud chain
  * contract, and the construction-time schema boundary
  * ([[graft.sources.v2.SnapshotChangesSource]]). */
class SnapshotChangesSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapcdc_spec").toString + "/t"

  private def drainTo(root: String, name: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.catalog.dropTempView(name)
    spark.readStream.format("snapshot-changes").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
  }

  test("version offsets: the bootstrap feed and each tracked commit " +
      "arrive as micro-batches; the drained stream equals the stored " +
      "feed read in batch") {
    val root = freshRoot()
    SnapshotTable.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      changeKeys = Seq("k"))
    val q = drainTo(root, "snapcdc_happy")
    try {
      q.processAllAvailable()
      SnapshotTable.commit(spark, root,
        Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), changeKeys = Seq("k"))
      q.processAllAvailable()
      SnapshotTable.commit(spark, root,
        Seq((3L, "c")).toDF("k", "v"), changeKeys = Seq("k"))
      q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("change"), col("v"), col("version"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
    val streamed = canon(spark.table("snapcdc_happy"))
    assert(streamed == canon(SnapshotTable.readChanges(spark, root, 0L)))
    assert(streamed.contains((1L, "insert", "a", 1L)) &&
      streamed.contains((2L, "delete", "b", 2L)) &&
      streamed.contains((1L, "delete", "a2", 3L)))
  }

  test("mutation feeds compose through one LIVE stream: a targeted " +
      "upsert's updates, a DV delete's retractions and a restore's net " +
      "diff all drain into a CDC-maintained view that tracks the tip") {
    val root = freshRoot()
    val view = Files.createTempDirectory("graft_snapcdc_view").toString + "/v"
    val ckpt = Files.createTempDirectory("graft_snapcdc_ck").toString
    SnapshotTable.commit(spark, root,
      (1L to 8L).map(i => (i, s"v$i")).toDF("k", "v"),
      changeKeys = Seq("k"))
    val q = spark.readStream.format("snapshot-changes").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        SnapshotTable.applyChangesCycle(batch, view, Seq("k"),
          df => df.select(col("k"), upper(col("v")).as("u")))
        ()
      }.start()
    def viewRows(): Set[(Long, String)] =
      SnapshotTable.read(spark, view).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    try {
      q.processAllAvailable()
      // a targeted upsert's batch-scoped feed step
      SnapshotTable.upsertTargeted(
        Seq((2L, "v2x"), (9L, "v9")).toDF("k", "v"), root, Seq("k"),
        trackChanges = true)
      q.processAllAvailable()
      assert(viewRows() == ((1L to 8L).map(i => (i, s"V$i")).toSet
        - (2L -> "V2") + (2L -> "V2X") + (9L -> "V9")))
      // a DV delete's tombstones arrive as retractions
      SnapshotTable.deleteWhereDV(spark, root,
        col("k") >= 7L, changeKeys = Seq("k"))
      q.processAllAvailable()
      assert(viewRows().map(_._1) == (1L to 6L).toSet,
        "the DV delete's feed must retract the tombstoned keys")
      // a tracked restore rolls the view back with the table
      SnapshotTable.restore(spark, root, 1L, changeKeys = Seq("k"))
      q.processAllAvailable()
      assert(viewRows() == (1L to 8L).map(i => (i, s"V$i")).toSet,
        "the restore's net diff must roll the view back to v1's state")
    } finally q.stop()
  }

  test("chain gap fails the RUNNING query loudly: an untracked commit " +
      "in the middle must never be silently skipped over") {
    val root = freshRoot()
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("k", "v"),
      changeKeys = Seq("k"))
    val q = drainTo(root, "snapcdc_gap")
    try {
      q.processAllAvailable()
      SnapshotTable.commit(spark, root, Seq((2L, "b")).toDF("k", "v")) // UNTRACKED
      SnapshotTable.commit(spark, root, Seq((2L, "b"), (3L, "c")).toDF("k", "v"),
        changeKeys = Seq("k"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("GAP"), s"wrong failure: $msgs")
    } finally q.stop()
  }

  test("startVersion option: a consumer that already bootstrapped " +
      "resumes after its last version, skipping the insert replay") {
    val root = freshRoot()
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("k", "v"),
      changeKeys = Seq("k"))
    SnapshotTable.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      changeKeys = Seq("k"))
    spark.catalog.dropTempView("snapcdc_sv")
    val q = spark.readStream.format("snapshot-changes")
      .option("startVersion", "1").load(root)
      .writeStream.format("memory").queryName("snapcdc_sv")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("snapcdc_sv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got == Set((2L, "insert", 2L)))
  }

  test("maxVersionsPerTrigger: a multi-version backlog drains as " +
      "MULTIPLE checkpointable micro-batches (one feed step each), " +
      "with the same rows as the uncapped stream") {
    val root = freshRoot()
    for (i <- 1 to 3)
      SnapshotTable.commit(spark, root,
        Seq((i.toLong, s"s$i")).toDF("k", "v"), changeKeys = Seq("k"))
    spark.catalog.dropTempView("snapcdc_adm")
    val q = spark.readStream.format("snapshot-changes")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.format("memory").queryName("snapcdc_adm")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("change"), col("v"), col("version"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
    assert(canon(spark.table("snapcdc_adm")) ==
      canon(SnapshotTable.readChanges(spark, root, 0L)))
    // the cap is the point: the 3-step backlog must NOT arrive as one
    // all-or-nothing batch
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"backlog drained in $batches batches, cap ignored")
  }

  test("construction is loud on a feed-less table and on non-scalar " +
      "schemas (the documented reader boundary)") {
    val bare = freshRoot()
    SnapshotTable.commit(spark, bare, Seq((1L, "a")).toDF("k", "v")) // untracked
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("snapshot-changes").load(bare)
    }
    assert(e.getMessage.contains("no stored change feed"))
    val nested = freshRoot()
    SnapshotTable.commit(spark, nested,
      Seq((1L, Seq(1.0, 2.0))).toDF("k", "emb"), changeKeys = Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      spark.readStream.format("snapshot-changes").load(nested)
    }
    assert(e2.getMessage.contains("flat scalar"))
  }
}
