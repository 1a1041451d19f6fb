package graft

import org.apache.spark.sql.functions.col
import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).collect().head.get(0)

  test("tokenCount") {
    assert(one("a b c", TextAnalysis.tokenCount(col("text"))) == 3L)
  }

  test("langId votes by stopwords with deterministic ties") {
    assert(one("the cat sat on a mat", TextAnalysis.langId(col("text"))) == "en")
    assert(one("el gato y la casa", TextAnalysis.langId(col("text"))) == "es")
    assert(one("xyz qrs tuv", TextAnalysis.langId(col("text"))) == "und")
  }

  test("fingerprint is invariant to token order and duplication") {
    val a = one("b a c", TextAnalysis.fingerprint(col("text")))
    val b = one("c b a a", TextAnalysis.fingerprint(col("text")))
    val c = one("c b d", TextAnalysis.fingerprint(col("text")))
    assert(a == b)
    assert(a != c)
  }

  test("qualityScore in [0,1], higher for stopword-rich text") {
    val lo = one("zzz qqq", TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val hi = one("the a of and is to in the a of", TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(lo >= 0.0 && hi <= 1.0 && hi > lo)
  }

  test("rollingHash: deterministic, order-sensitive") {
    val a = one("abc", TextAnalysis.rollingHash(col("text")))
    val b = one("abc", TextAnalysis.rollingHash(col("text")))
    val c = one("cba", TextAnalysis.rollingHash(col("text")))
    assert(a == b)
    assert(a != c)
  }

  test("repetitionStats: native hash-count pass finds the top n-gram multiplicity") {
    // "a b a b a b c": bigrams a_b(x3), b_a(x2), b_c(x1) -> top=3 of 6
    val r = Seq("a b a b a b c").toDF("text")
      .select(TextAnalysis.repetitionStats(col("text"), 2).as("r"))
      .select("r.*").collect().head
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("n_ngrams") == 6L)
    assert(r.getAs[Long]("top_ngram_count") == 3L)
    assert(r.getAs[Double]("top_ngram_frac") == 3.0 / 6.0)
    // 7 tokens, 3 distinct -> 4/7 repeats
    assert(r.getAs[Double]("rep_token_frac") == 4.0 / 7.0)
  }

  test("repetitionStats: degenerate short docs do not divide by zero") {
    val r = Seq("solo").toDF("text")
      .select(TextAnalysis.repetitionStats(col("text"), 2).as("r"))
      .select("r.*").collect().head
    assert(r.getAs[Long]("n_ngrams") == 0L)
    assert(r.getAs[Long]("top_ngram_count") == 0L)
    assert(r.getAs[Double]("top_ngram_frac") == 0.0)
    assert(r.getAs[Double]("rep_token_frac") == 0.0)
  }

  test("redactPii scrubs emails, SSNs, phones and IPv4s") {
    val dirty = "mail a.user+x@sub.example.org ssn 123-45-6789 " +
      "call 919-555-1234 or 919.555.1234 host 192.168.0.1 keep v1.2 and 2023"
    val clean = one(dirty, TextAnalysis.redactPii(col("text")))
    assert(clean == "mail <EMAIL> ssn <SSN> call <PHONE> or <PHONE> " +
      "host <IP> keep v1.2 and 2023")
  }

  test("subwordCount counts ceil(len/4) units per word") {
    // "distributed" (11 chars -> 3) + "db" (2 -> 1)
    assert(one("distributed db", TextAnalysis.subwordCount(col("text"))) == 4L)
  }
}
