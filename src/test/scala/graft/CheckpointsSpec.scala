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
