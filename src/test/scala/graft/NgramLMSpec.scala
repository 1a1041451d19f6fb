package graft

import graft.operators.NgramLM

class NgramLMSpec extends SparkSpec {
  import spark.implicits._

  test("fit + score: add-one-smoothed bigram probabilities, hand-computed") {
    // reference "a b a b": bigrams (a,b)x2 (b,a)x1; contexts a->2 b->1; V=2
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val model = NgramLM.fit(ref, "doc_id", "text")
    assert(model.vocabSize == 2L)

    val docs = Seq(
      (1L, "a b"), // p(b|a) = (2+1)/(2+2) = 0.75
      (2L, "b b"), // p(b|b) = (0+1)/(1+2) = 1/3
      (3L, "a c"), // p(c|a) = (0+1)/(2+2) = 0.25 (unseen bigram, seen context)
      (4L, "x")    // no bigrams -> absent from output
    ).toDF("doc_id", "text")
    val out = NgramLM.score(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == (1L, 0.75))
    assert(out(2L) == (1L, 0.333333))
    assert(out(3L) == (1L, 0.25))
    assert(!out.contains(4L))
  }

  test("reference-like text scores higher than garbled text") {
    val ref = (0L to 19L).map(i => (i, "the cat sat on the mat and the dog ran"))
      .toDF("doc_id", "text")
    val model = NgramLM.fit(ref, "doc_id", "text")
    val docs = Seq(
      (100L, "the cat sat on the mat"),   // in-distribution
      (101L, "mat the on sat cat the")    // scrambled
    ).toDF("doc_id", "text")
    val scores = NgramLM.score(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(100L) > scores(101L))
  }
}
