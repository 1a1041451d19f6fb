package graft

import graft.core.Checkpoints
import org.apache.spark.sql.functions._

/** Checkpoint-block attribution: [[Checkpoints.eager]] must tag a
  * checkpoint with ONLY its own persisted RDD ids, so freeing one
  * generation can never kill another live checkpoint's blocks (the
  * failure mode of before/after set-diff attribution under interleaved
  * checkpoints). */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("eager returns ids that are actually persisted, free releases them") {
    val (df, ids) = Checkpoints.eager((1L to 100L).toDF("k"))
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.nonEmpty && ids.forall(persisted.contains),
      s"attributed ids $ids must all be persisted ($persisted)")
    assert(df.count() == 100)
    Checkpoints.free(df, ids)
    // unpersist is async; poll briefly for the blocks to drop
    val deadline = System.nanoTime() + 10_000_000_000L
    while (ids.exists(spark.sparkContext.getPersistentRDDs.contains)
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!ids.exists(spark.sparkContext.getPersistentRDDs.contains),
      "freed ids should leave the persistent-RDD registry")
  }

  test("reliable backend: eager/lazily route through Dataset.checkpoint " +
      "(survives executor loss on a real cluster), results unchanged, " +
      "and an iterative operator under it matches the local backend") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toString
    val localRanks = graft.operators.Graph.pageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst"),
      iterations = 6, checkpointInterval = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.checkpoint.backend", "reliable")
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val (df, ids) = Checkpoints.eager((1L to 100L).toDF("k"))
      assert(df.count() == 100 && ids.nonEmpty)
      // reliable checkpoints live as FILES in the checkpoint dir —
      // free must delete them (nothing else ever does), or every
      // superseded generation leaks storage forever
      val ckptFiles = df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile)
      assert(ckptFiles.nonEmpty, "eager(reliable) must checkpoint to files")
      Checkpoints.free(df, ids)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(ckptFiles.forall(f =>
        !fs.exists(new org.apache.hadoop.fs.Path(f))),
        "free must delete a superseded reliable checkpoint's files")
      val (lz, _) = Checkpoints.lazily((1L to 30L).toDF("k"))
      assert(lz.agg(sum(col("k"))).as[Long].head() == 30L * 31 / 2)
      // an iterative operator (checkpoints per generation) is
      // hash-unchanged under the reliable backend
      val reliableRanks = graft.operators.Graph.pageRank(
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst"),
        iterations = 6, checkpointInterval = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliableRanks == localRanks,
        "backend choice changed an iterative result")
    } finally {
      spark.conf.set("spark.graft.checkpoint.backend", "local")
      spark.conf.unset("spark.graft.checkpoint.dir")
    }
  }

  test("interleaved checkpoints: freeing one leaves the other readable") {
    val (a, aIds) = Checkpoints.eager((1L to 50L).toDF("k"))
    val (b, bIds) = Checkpoints.eager((1L to 70L).toDF("k"))
    assert(aIds.intersect(bIds).isEmpty,
      "two checkpoints must never share attributed ids")
    Checkpoints.free(a, aIds)
    // b's blocks must survive a's free — localCheckpoint blocks are
    // non-recomputable, so mis-attribution here would throw
    assert(b.agg(sum(col("k"))).as[Long].head() == 70L * 71 / 2)
    Checkpoints.free(b, bIds)
  }
}
