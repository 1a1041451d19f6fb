package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Stage-level profiler: run one suite query by name and print every
  * completed stage's wall time, task count and shuffle volumes —
  * `runMain graft.StageProfile <query> [sfDir]`. The first diagnostic
  * for "this query is slow": is the time in a few heavy stages (data
  * problem) or smeared across dozens of tiny ones (scheduling/plan
  * problem)?
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.Session.local("graft-stage-profile")
    val stages = ArrayBuffer.empty[(Int, String, Long, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(80), wall,
          si.numTasks, si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    })
    val tc = System.nanoTime()
    val df = Queries.queries(name)(spark, sfDir)
    val constructSec = (System.nanoTime() - tc) / 1e9
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val execSec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // drain async listener bus
    println(f"[profile] $name construct $constructSec%.2f s + exec $execSec%.2f s, ${stages.size} stages")
    stages.sortBy(-_._3).foreach { case (id, nm, wall, tasks, sr, sw) =>
      println(f"[profile] stage $id%4d ${wall / 1000.0}%7.2f s tasks=$tasks%4d shufR=${sr / 1e6}%8.2f MB shufW=${sw / 1e6}%8.2f MB  $nm")
    }
    spark.stop()
  }
}
