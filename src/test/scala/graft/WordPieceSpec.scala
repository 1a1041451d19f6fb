package graft

import graft.operators.WordPiece

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("encode: the canonical BERT walk, greedy longest-match, UNK paths") {
    val vocab = Seq("un", "##aff", "##ord", "##able",
      "a", "ab", "##c", "##bc", "x", "##z")
    val df = Seq(
      (1L, "unaffordable"),       // the textbook example
      (2L, "abc"),                // greedy takes ab over a (longest wins)
      (3L, "xyz"),                // '##y' not in vocab -> whole word UNK
      (4L, "a aaaaaaaaaaaaaaaaa") // 17 chars > maxWordLen -> UNK
    ).toDF("id", "text")
    val out = WordPiece.encode(df, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("un", "##aff", "##ord", "##able"))
    assert(out(2L) == Seq("ab", "##c"))
    assert(out(3L) == Seq("[UNK]"))
    assert(out(4L) == Seq("a", "[UNK]"))
  }

  test("buildVocab: full charset coverage makes mid-word failure impossible") {
    val df = Seq((1L, "spark spark sparkly park"),
      (2L, "parking sparks park")).toDF("id", "text")
    val vocab = WordPiece.buildVocab(df, "text", topK = 5)
    // every char in both forms
    for (c <- "sparklying".distinct.map(_.toString))
      assert(vocab.contains(c) && vocab.contains("##" + c))
    val out = WordPiece.encode(df, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(!out.values.flatten.exists(_ == "[UNK]"))
    // the reassembled text survives the round trip (## stripped)
    val flat = out(1L).map(t => t.stripPrefix("##")).mkString
    assert(flat == "sparksparksparklypark")
  }

  test("encode: deterministic across repartitionings") {
    val docs = (1L to 80L)
      .map(i => (i, s"alpha bet${i % 7} gamma${i % 3} delta"))
      .toDF("id", "text")
    val vocab = WordPiece.buildVocab(docs, "text", topK = 10)
    val a = WordPiece.encode(docs.repartition(9), "id", "text", vocab)
      .collect().map(_.toSeq).toSet
    val b = WordPiece.encode(docs.coalesce(1), "id", "text", vocab)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 80)
  }
}
