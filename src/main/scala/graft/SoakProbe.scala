package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Sub-step probe for the soak's super-linear ops: stage-level timing
  * of the MinHash-LSH verify path on the 10× soak corpus.
  * `runMain graft.SoakProbe [workDir]`. */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.length > 0) args(0) else "/tmp/graft_soak"
    val spark = core.Session.local("graft-soak-probe")
    val docs10 = spark.read.parquet(s"$workDir/documents10x.parquet")

    // appended from the listener-bus thread, drained from main: every
    // access goes through stages.synchronized, and time() snapshots
    // under the lock after the settle sleep so a late stage event can
    // neither tear the sort nor leak into the next step's table
    val stages = ArrayBuffer.empty[(Int, String, Long, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        val cpu = si.taskMetrics.executorCpuTime / 1000000L
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            wall, si.numTasks, cpu))
        }
      }
    })

    def time[A](name: String)(f: => A): A = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val a = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val snap = stages.synchronized(stages.toList)
      println(f"[probe] $name%-32s $wall%8.2f s")
      snap.sortBy(-_._3).take(8).foreach { case (id, nm, w, nt, cpu) =>
        println(f"[probe]   stage $id%4d ${w / 1000.0}%8.2f s wall ${cpu / 1000.0}%8.2f s cpu tasks=$nt%4d  $nm")
      }
      a
    }

    import operators.Dedup
    val sigs = time("signatures") {
      val s = Dedup.minhashSignatures(docs10, "doc_id", "text", 128, 3)
        .localCheckpoint()
      s.count(); s
    }
    val cands = time("lsh candidates") {
      val c = Dedup.lshCandidates(sigs, 32, 4, maxBucketSize = 64)
        .localCheckpoint()
      println(s"[probe]   cand pairs = ${c.count()}")
      c
    }
    import graft.plans.SetExpressions.jaccard_sorted
    val sortedSets = time("sorted sets (ckpt)") {
      val s = Dedup.shingleSets(docs10, "doc_id", "text", 3)
        .select(col("id"), sort_array(col("sh")).as("sh"))
        .localCheckpoint()
      s.count(); s
    }
    val joined = time("join only (ckpt sets, no kernel)") {
      val j = cands
        .join(sortedSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sortedSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .localCheckpoint()
      println(s"[probe]   joined rows = ${j.count()}")
      j
    }
    time("light touch on ckpt joined") {
      println("[probe]   rows = " + joined
        .filter(size(col("sh_a")) + size(col("sh_b")) > 0).count())
    }
    time("element_at touch on ckpt joined") {
      println("[probe]   rows = " + joined
        .filter(element_at(col("sh_a"), 1) <= element_at(col("sh_b"), 1) ||
          element_at(col("sh_a"), 1) > element_at(col("sh_b"), 1)).count())
    }
    time("jaccard kernel on ckpt joined") {
      println("[probe]   verified pairs = " + joined
        .withColumn("j", jaccard_sorted(col("sh_a"), col("sh_b")))
        .filter(col("j") >= 0.8).count())
    }
    time("verify jaccard end-to-end (orig)") {
      val sets = Dedup.shingleSets(docs10, "doc_id", "text", 3)
      def side(a: String) = sets.select(col("id").as(s"id_$a"),
        sort_array(col("sh")).as(s"sh_$a"))
      println("[probe]   verified pairs = " + cands
        .join(side("a"), "id_a").join(side("b"), "id_b")
        .withColumn("j", jaccard_sorted(col("sh_a"), col("sh_b")))
        .filter(col("j") >= 0.8).count())
    }
    spark.stop()
  }
}
