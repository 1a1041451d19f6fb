package graft

import graft.operators.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("encode: Viterbi beats greedy; tie takes the longest last piece") {
    // costs: 'ab'=1.0, 'abc'=2.5, 'de'=1.0, chars=2.0 each.
    // word "abcde": greedy longest-first would take abc (2.5) then de
    // (1.0) = 3.5; Viterbi finds ab + c + de = 1.0+2.0+1.0 = 4.0 —
    // here greedy wins, so flip: make 'abc' expensive relative to the
    // split. With abc=4.5: greedy(WordPiece) = abc,de = 5.5; Viterbi
    // = ab,c,de = 4.0 — the global optimum differs from greedy.
    val vocab = Seq("a" -> 2.0, "b" -> 2.0, "c" -> 2.0, "d" -> 2.0,
      "e" -> 2.0, "ab" -> 1.0, "abc" -> 4.5, "de" -> 1.0)
    val df = Seq((1L, "abcde")).toDF("id", "text")
    val out = Unigram.encode(df, "id", "text", vocab).collect().head
    assert(out.getSeq[String](1) == Seq("ab", "c", "de"))
    assert(out.getLong(2) == 3 && out.getDouble(3) == 4.0)
    // exact tie: "aa" via 'aa'(4.0) or 'a'+'a' (2.0+2.0=4.0) — the
    // named rule prefers the LONGEST last piece: single 'aa'
    val v2 = Seq("a" -> 2.0, "aa" -> 4.0)
    val t = Unigram.encode(Seq((1L, "aa")).toDF("id", "text"),
      "id", "text", v2).collect().head
    assert(t.getSeq[String](1) == Seq("aa"))
  }

  test("encode: length contract -> [UNK] at cost 0; cost folds in word order") {
    val vocab = Seq("a" -> 1.5, "b" -> 0.5)
    val df = Seq((1L, "ab baaaaaaaaaaaaaaab ba")).toDF("id", "text")
    val out = Unigram.encode(df, "id", "text", vocab).collect().head
    assert(out.getSeq[String](1) == Seq("a", "b", "[UNK]", "b", "a"))
    // cost = (1.5+0.5) + 0.0 + (0.5+1.5) = 4.0
    assert(out.getDouble(3) == 4.0)
  }

  test("buildVocab + encode: deterministic across repartitionings, no UNK") {
    val docs = (1L to 60L)
      .map(i => (i, s"tok${i % 5} banana apple${i % 3}"))
      .toDF("id", "text")
    val vocab = Unigram.buildVocab(docs, "text", topK = 12)
    val a = Unigram.encode(docs.repartition(7), "id", "text", vocab)
      .collect().map(_.toSeq).toSet
    val b = Unigram.encode(docs.coalesce(1), "id", "text", vocab)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 60)
    assert(!a.flatMap(_(1).asInstanceOf[scala.collection.Seq[String]])
      .contains("[UNK]"))
  }
}
