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
