package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges: frequency-weighted argmax, then merged symbols pair up") {
    // words: aa x2, ab x1 -> round 1 merges 'a a' (count 2); round 2
    // only 'a b' remains (the merged 'aa' word is a single symbol)
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
    assert(m.length == 2) // round 3 finds no pairs -> early stop
    assert(m(0).getInt(0) == 1 && m(0).getString(1) == "a a" &&
      m(0).getString(2) == "aa" && m(0).getLong(3) == 2L)
    assert(m(1).getInt(0) == 2 && m(1).getString(1) == "a b" &&
      m(1).getString(2) == "ab" && m(1).getLong(3) == 1L)
  }

  test("trainMerges: ties break by binary pair order") {
    val docs = Seq((1L, "xy yx")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", rounds = 1).collect()
    assert(m.head.getString(1) == "x y") // 'x y' < 'y x'
  }

  test("applyMerges: zero-shuffle per-doc BPE token count") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ba")).toDF("doc_id", "text")
    val merges = Seq(("a a", "aa"), ("a b", "ab"))
    val out = Bpe.applyMerges(docs, "text", "doc_id", merges)
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: aa->1, ab->1, aa->1 = 3; doc 2: 'b a' has no merge -> 2
    assert(rows(1L) == 3L)
    assert(rows(2L) == 2L)
    // plan: no exchange (map-side transform+aggregate, no explode)
    val p = out.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"apply must be a map pass:\n$p")
  }

  test("replace is non-overlapping left-to-right in both engines") {
    // 'a a a' under merge 'a a'->'aa': leftmost pair wins -> 'aa a'
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = Seq(("a a", "aa"))
    val n = Bpe.applyMerges(docs, "text", "doc_id", m).collect().head.getLong(1)
    assert(n == 2L) // 'aa' + 'a'
  }

  test("vocab: alphabet in binary order, merges appended, first-wins on collisions") {
    val docs = Seq((1L, "ba ab")).toDF("doc_id", "text")
    // alphabet {a, b} -> ids 0, 1; merges get 2, 3...
    val v = Bpe.vocab(docs, "text", Seq(("a b", "ab"), ("b a", "ba")))
    assert(v == Seq(("a", 0L), ("b", 1L), ("ab", 2L), ("ba", 3L)))
    // two merges composing the same string: the EARLIER id survives
    val v2 = Bpe.vocab(docs, "text", Seq(("a b", "ab"), ("a b", "ab")))
    assert(v2 == Seq(("a", 0L), ("b", 1L), ("ab", 2L)))
  }

  test("vocab: non-ASCII alphabet is code-point split and code-point ordered") {
    // é (U+00E9), 日 (U+65E5), 😀 (U+1F600 — a SURROGATE PAIR in the
    // JVM: a UTF-16 code-unit split would fabricate two lone-surrogate
    // entries here) — plus ASCII. Expected order = code point order,
    // which is also UTF-8 binary order (what DuckDB's ORDER BY does).
    val docs = Seq((1L, "zé 😀日 az")).toDF("doc_id", "text")
    val v = Bpe.vocab(docs, "text", Nil)
    assert(v.map(_._1) ==
      Seq("a", "z", "é", "日", "😀"))
    assert(v.forall { case (t, _) => t.codePointCount(0, t.length) == 1 },
      s"every alphabet entry must be ONE code point, got $v")
    // and encode over the same corpus has no OOV, by construction
    val enc = Bpe.encode(docs, "text", "doc_id", Nil, v)
    val ids = enc.collect().head.getSeq[Any](1)
    assert(!ids.contains(null), s"OOV NULL leaked: $ids")
    assert(ids.length == 6) // z é | 😀 日 | a z
  }

  test("continueMerges: continuation equals training straight through") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    val full = rows(Bpe.trainMerges(docs, "text", rounds = 5))
    val first3 = full.take(3)
    val cont = rows(Bpe.continueMerges(docs, "text",
      first3.map(m => (m._2, m._3)), rounds = 2))
    assert(cont === full.drop(3),
      "continuing from the first 3 merges must reproduce merges 4..5")
    // numbering continues from the frozen prefix
    assert(cont.map(_._1) === Seq(4, 5))
  }

  test("encodeWords/decodeWords: exact round-trip on real fixture docs") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Bpe.vocab(docs, "text", merges)
    val enc = Bpe.encodeWords(docs, "text", "doc_id", merges, vocab)
    val bad = enc.join(docs, "doc_id")
      .withColumn("rt", Bpe.decodeWords(col("bpe_word_ids"), vocab))
      .filter(col("rt") =!= col("text"))
      .count()
    assert(bad === 0L, "decode(encode(text)) must reproduce every doc")
  }

  test("encode: id sequences follow merges; OOV is NULL; zero-shuffle plan") {
    val docs = Seq((1L, "aa ab ba"), (2L, "a  z")).toDF("doc_id", "text")
    val merges = Seq(("a a", "aa"), ("a b", "ab"))
    val vocab = Bpe.vocab(Seq((1L, "aa ab ba")).toDF("doc_id", "text"),
      "text", merges) // built WITHOUT 'z' -> z is OOV for doc 2
    val out = Bpe.encode(docs, "text", "doc_id", merges, vocab)
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getSeq[Any](1), r.getLong(2))).toMap
    // vocab: a=0, b=1, aa=2, ab=3
    assert(rows(1L)._1 == Seq(2L, 3L, 1L, 0L)) // aa | ab | b,a
    assert(rows(1L)._2 == 4L)
    // doc 2: double space -> empty word dropped; 'z' unseen -> null id
    assert(rows(2L)._1 == Seq(0L, null))
    assert(rows(2L)._2 == 2L)
    val p = out.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"encode must be a map pass:\n$p")
  }

  test("encodeFallback: byte ids for unseen code points, exact agreement in-vocab, zero-shuffle") {
    val train = Seq((1L, "aa ab ba")).toDF("doc_id", "text")
    val merges = Seq(("a a", "aa"), ("a b", "ab"))
    val vocab = Bpe.vocab(train, "text", merges) // a=0 b=1 aa=2 ab=3
    val base = vocab.map(_._2).max + 1 // 4
    // in-vocab text: identical ids to plain encode, n_fallback = 0
    val same = Bpe.encodeFallback(train, "text", "doc_id", merges, vocab)
      .collect().map(r => (r.getSeq[Any](1), r.getLong(2), r.getLong(3))).head
    assert(same._1 == Seq(2L, 3L, 1L, 0L) && same._2 == 4L && same._3 == 0L)
    // held-out text: 'z' (0x7A), 'ü' (0xC3 0xBC), '🚀' (0xF0 0x9F 0x9A
    // 0x80) are unseen -> UTF-8 byte ids in [base, base+256); 'a' stays
    // vocab id 0. No NULLs anywhere — OOV impossible by construction.
    val hold = Seq((9L, "a zü🚀")).toDF("doc_id", "text")
    val out = Bpe.encodeFallback(hold, "text", "doc_id", merges, vocab)
    val r = out.collect().head
    assert(r.getSeq[Any](1) == Seq(0L,
      base + 0x7AL, base + 0xC3L, base + 0xBCL,
      base + 0xF0L, base + 0x9FL, base + 0x9AL, base + 0x80L))
    assert(r.getLong(2) == 8L && r.getLong(3) == 7L)
    // plain encode on the same text surfaces NULLs instead
    val plain = Bpe.encode(hold, "text", "doc_id", merges, vocab)
      .collect().head.getSeq[Any](1)
    assert(plain.count(_ == null) == 3) // z, ü, 🚀 symbols
    val p = out.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"fallback encode must be a map pass:\n$p")
  }

  test("save/load round-trip: reloaded tokenizer encodes identically") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
    val merges = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Bpe.vocab(docs, "text", merges)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe").toString
    Bpe.save(spark, path, merges, vocab)
    val (m2, v2) = Bpe.load(spark, path)
    assert(m2 == merges, "merge ORDER must survive the round-trip")
    assert(v2 == vocab.sortBy(_._2))
    val a = Bpe.encode(docs, "text", "doc_id", merges, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val b = Bpe.encode(docs, "text", "doc_id", m2, v2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(a == b)
  }
}
