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
  test("pmiPhrases: collocation outranks chance co-occurrence; counts exact") {
    // "alpha beta" always adjacent (6 times); "gamma" and "delta"
    // frequent but never adjacent to each other; filler separates.
    val docs = (0L until 6L).map(i =>
      (i, s"alpha beta filler$i gamma filler${i + 10} delta end$i"))
      .toDF("doc_id", "text")
    val out = NgramLM.pmiPhrases(docs, "doc_id", "text", minCount = 5L,
      topK = 10).collect()
    assert(out.head.getString(0) == "alpha" && out.head.getString(1) == "beta",
      "the planted collocation must rank first")
    assert(out.head.getLong(2) == 6L)
    // 7 tokens x 6 docs = 42 tokens, 6 bigrams x 6 docs = 36 bigrams;
    // PMI of the always-adjacent pair: ln((6/36) / ((6/42)*(6/42)))
    val exp = BigDecimal(math.log((6.0 * 42 * 42) / (36.0 * 6 * 6)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getDouble(3) == exp)
    assert(!out.exists(r => r.getString(0) == "gamma" && r.getString(1) == "delta"),
      "never-adjacent words are not a phrase")
  }

  test("pmiPhrases: minCount prunes rare pairs; topK bounds output") {
    val docs = (0L until 6L).map(i => (i, "x y x y x y rare once"))
      .toDF("doc_id", "text")
    val out = NgramLM.pmiPhrases(docs, "doc_id", "text", minCount = 7L,
      topK = 2).collect()
    assert(out.length <= 2)
    assert(out.forall(_.getLong(2) >= 7L))
  }

  test("fitKN + scoreKN: interpolated Kneser-Ney, hand-computed") {
    // reference "a b a c": bigram types (a,b),(b,a),(a,c) each once;
    // contexts a:(c1=2,n1f=2) b:(1,1); continuations b:1,a:1,c:1;
    // N1+(..)=3, V=3
    val ref = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val m = NgramLM.fitKN(ref, "doc_id", "text")
    assert(m.nTypes == 3L && m.vocabSize == 3L)
    val docs = Seq(
      (1L, "a b"),  // seen: max(1-.75,0)/2 + (.75*2/2)*(1/3) = 0.375
      (2L, "z b"),  // unseen context: pcont(b) = 1/3
      (3L, "z q"),  // unseen word too: 1/(3+3)
      (4L, "a z")   // seen context, unseen word: 0 + (.75*2/2)*(1/6) = 0.125
    ).toDF("doc_id", "text")
    val out = NgramLM.scoreKN(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(out(1L) - 0.375) < 1e-9)
    assert(math.abs(out(2L) - 0.333333) < 1e-9)
    assert(math.abs(out(3L) - 0.166667) < 1e-9)
    assert(math.abs(out(4L) - 0.125) < 1e-9)
  }

  test("scoreKN: continuation probability demotes high-count narrow-context words") {
    // "francisco" appears often but ONLY after "san"; "the" appears in
    // many contexts. After an unseen context, KN must prefer "the".
    val ref = Seq((0L,
      "san francisco san francisco san francisco san francisco " +
        "the cat the dog the bird a the b the c the")).toDF("doc_id", "text")
    val m = NgramLM.fitKN(ref, "doc_id", "text")
    val docs = Seq((1L, "zzz the"), (2L, "zzz francisco")).toDF("doc_id", "text")
    val out = NgramLM.scoreKN(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L),
      s"many-context 'the' (${out(1L)}) must outscore narrow 'francisco' (${out(2L)})")
  }

  test("scoreKN: deterministic across repartitionings") {
    val ref = (0L until 40L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("doc_id", "text")
    val docs = (100L until 140L).map(i => (i, s"tok${i % 11} tok${i % 7} tok${i % 13}"))
      .toDF("doc_id", "text")
    val m = NgramLM.fitKN(ref, "doc_id", "text")
    val a = NgramLM.scoreKN(docs.repartition(7), "doc_id", "text", m)
      .collect().map(_.toSeq).toSet
    val b = NgramLM.scoreKN(docs.coalesce(1), "doc_id", "text", m)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
