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

  test("naiveBayes: hand-computed two-class scores and argmax") {
    // train: spam = "buy now", ham = "hello friend hello".
    // N=2, V=4. spam: T=2, ham: T=3.
    // score("hello", spam) = ln(1/2) + ln((0+1)/(2+4))
    // score("hello", ham)  = ln(1/2) + ln((2+1)/(3+4))
    val train = Seq(("spam", "buy now"), ("ham", "hello friend hello"))
      .toDF("label", "text")
    val docs = Seq((1L, "hello"), (2L, "buy")).toDF("doc_id", "text")
    val out = Classifier.naiveBayes(train, docs, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == "ham" && out(2L)._1 == "spam")
    def ll(x: Double) = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected1 = BigDecimal(ll(0.5) + ll(3.0 / 7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L)._2 - expected1) < 1e-9)
  }

  test("naiveBayes: OOV tokens hit the add-one floor, ties break by class name") {
    val train = Seq(("a", "x y"), ("b", "x y")).toDF("label", "text")
    val docs = Seq((1L, "zzz")).toDF("doc_id", "text")
    val out = Classifier.naiveBayes(train, docs, "doc_id", "text", "label").collect()
    // symmetric classes -> identical scores -> class "a" wins the tie
    assert(out.length == 1 && out.head.getString(1) == "a")
  }

  test("naiveBayes: planted class markers dominate; deterministic across partitionings") {
    val train = (0L until 60L).map { i =>
      val c = if (i % 2 == 0) "red" else "blue"
      (c, s"noise${i % 7} filler${i % 5} marker$c marker$c")
    }.toDF("label", "text")
    val docs = (0L until 40L).map { i =>
      val c = if (i % 2 == 0) "red" else "blue"
      (i, s"noise${i % 7} filler${(i + 1) % 5} marker$c")
    }.toDF("doc_id", "text")
    val preds = Classifier.naiveBayes(train, docs, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 40L).forall(i =>
      preds(i) == (if (i % 2 == 0) "red" else "blue")))
    val a = Classifier.naiveBayes(train.repartition(7), docs.repartition(5),
      "doc_id", "text", "label").collect().map(_.toSeq).toSet
    val b = Classifier.naiveBayes(train.coalesce(1), docs.coalesce(1),
      "doc_id", "text", "label").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("chi2Features: hand-computed 2x2 table, zero-signal guards") {
    // apple appears in both A docs and neither B doc: a=2,b=0,c=0,d=2
    // -> chi2 = 4*(2*2)^2/(2*2*2*2) = 4.0; banana splits evenly ->
    // delta 0 -> chi2 0; "the" is in EVERY doc -> guard path, chi2 0
    val docs = Seq(
      (1L, "the apple banana", "A"), (2L, "the apple cherry", "A"),
      (3L, "the dog banana", "B"), (4L, "the dog cherry", "B"))
      .toDF("doc_id", "text", "lang")
    val out = Classifier.chi2Features(docs, "doc_id", "text", "lang", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("A", "apple")).getDouble(4) == 4.0)
    assert(out(("A", "apple")).getLong(5) == 1, "apple is A's top feature")
    assert(out(("B", "dog")).getDouble(4) == 4.0)
    assert(out(("A", "banana")).getDouble(4) == 0.0)
    assert(out(("A", "the")).getDouble(4) == 0.0, "every-doc token guarded")
    assert(out(("A", "apple")).getLong(2) == 2 && out(("A", "apple")).getLong(3) == 2)
    // observed-pairs scoping: apple never appears under class B
    assert(!out.contains(("B", "apple")))
  }

  test("chi2Features: presence not frequency; deterministic across partitionings") {
    // repeating a token inside one doc must not change any count
    val docs = Seq(
      (1L, "x x x y", "A"), (2L, "x y", "A"), (3L, "y z", "B"))
      .toDF("doc_id", "text", "lang")
    val out = Classifier.chi2Features(docs, "doc_id", "text", "lang", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("A", "x")).getLong(2) == 2, "df_class counts docs, not tokens")
    val big = (0L until 120L).map { i =>
      val c = if (i % 3 == 0) "p" else "q"
      (i, s"tok${i % 11} tok${(i * 7) % 13} mark$c", c)
    }.toDF("doc_id", "text", "lang")
    val a = Classifier.chi2Features(big.repartition(7), "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet
    val b = Classifier.chi2Features(big.coalesce(1), "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("clusterLabels: planted markers rank first, shared filler drops, deterministic") {
    // every doc shares 'the'; each cluster has a frequent private
    // marker; 'rare' appears once in cluster A only
    val docs = Seq(
      ("A", "the ma ma rare"), ("A", "the ma ma"), ("A", "the ma"),
      ("B", "the mb mb"), ("B", "the mb mb"), ("B", "the mb")).toDF("c", "text")
    val rows = Classifier.clusterLabels(docs, "c", "text", topK = 2).collect()
    val out = rows.map(r => ((r.getString(0), r.getLong(5)), r.getString(1))).toMap
    // markers: max in-cluster tf AND corpus-rare -> rank 1 in each
    assert(out(("A", 1L)) == "ma" && out(("B", 1L)) == "mb")
    // hand-computed: A has 9 tokens, B 8 -> A_avg = 17/2 = 8.5;
    // ma: tf 5, corpus 5 -> round(5 * round(ln(1 + 8.5/5), 9), 6)
    val maScore = rows.find(r => r.getString(0) == "A" && r.getString(1) == "ma")
      .get.getDouble(4)
    val expect = BigDecimal(5.0 * BigDecimal(math.log(1.0 + 8.5 / 5.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(maScore == expect, s"got $maScore want $expect")
    val again = Classifier.clusterLabels(docs.repartition(5), "c", "text",
      topK = 2).collect().map(_.toSeq).toSet
    assert(again == Classifier.clusterLabels(docs.coalesce(1), "c", "text",
      topK = 2).collect().map(_.toSeq).toSet)
  }
}
