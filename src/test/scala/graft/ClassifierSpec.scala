package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("trainPerceptron: hand-computed trajectory; empty round is a no-op") {
    val docs = Seq(
      (Seq(2L, 0L), 1L),  // positive, fires on bucket 0
      (Seq(0L, 3L), -1L)  // negative, fires on bucket 1
    ).toDF("x", "y")
    val hist = Classifier.trainPerceptron(docs, col("x"), col("y"),
      dim = 2, rounds = 2)
    // round 1: w=0 -> both misclassified (y*(w.x) = 0 <= 0);
    // grad = (+1)[2,0] + (-1)[0,3] = [2,-3]
    assert(hist(0) === ((1, Vector(2L, -3L))))
    // round 2: both now correct -> empty gradient aggregate (nulls)
    // must read as zero, weights unchanged
    assert(hist(1) === ((2, Vector(2L, -3L))))
  }

  test("trainPerceptron: dim=1024 plans and runs (O(1) plan size in dim)") {
    // the pre-round-7 plan expanded dim literal dot terms and dim sum
    // columns — at 1024 that meant a four-thousand-node plan per
    // round; the array form must both PLAN and run in bounded time
    val dim = 1024
    val rows = (1L to 50L).map { i =>
      (Seq.tabulate(dim)(j => ((i + j) % 5).toLong),
        if (i % 2 == 0) 1L else -1L)
    }
    val t0 = System.nanoTime()
    val hist = Classifier.trainPerceptron(
      rows.toDF("x", "y").repartition(4), col("x"), col("y"), dim, 2)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, f"dim=1024 took $secs%.1f s — plan is dim-expanded again")
    assert(hist.size == 2 && hist.head._2.size == dim)
    // round 1 from w=0: every row misclassified; gradient[j] =
    // sum_i y_i * ((i + j) % 5) — replay it exactly in Scala
    val expect = Seq.tabulate(dim) { j =>
      (1L to 50L).map(i => (if (i % 2 == 0) 1L else -1L) * ((i + j) % 5)).sum
    }
    assert(hist.head._2 === expect)
  }

  test("trainPerceptron: deterministic across repartitionings") {
    val rows = (1L to 200L).map { i =>
      (Seq(i % 7, (i * 3) % 5, i % 2), if (i % 3 == 0) 1L else -1L)
    }
    val a = Classifier.trainPerceptron(
      rows.toDF("x", "y").repartition(7), col("x"), col("y"), 3, 3)
    val b = Classifier.trainPerceptron(
      rows.toDF("x", "y").coalesce(1), col("x"), col("y"), 3, 3)
    assert(a === b, "integer gradients must not depend on partitioning")
  }
}
