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

  test("pseudonymizePii: consistent surrogates, longest-match-first, types covered") {
    def mk(v: String) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      s"<pii_$h>"
    }
    // the same value maps to the SAME surrogate wherever it appears
    val dirty = "a@b.com wrote to c@d.org then a@b.com again at 10.0.0.1"
    val clean = one(dirty, TextAnalysis.pseudonymizePii(col("text")))
    assert(clean == s"${mk("a@b.com")} wrote to ${mk("c@d.org")} " +
      s"then ${mk("a@b.com")} again at ${mk("10.0.0.1")}")
    // substring hazard: a@b.com is a proper substring of xa@b.com —
    // short-first replacement would corrupt the longer match
    val hazard = "xa@b.com and a@b.com"
    assert(one(hazard, TextAnalysis.pseudonymizePii(col("text"))) ==
      s"${mk("xa@b.com")} and ${mk("a@b.com")}")
    // SSN and phone shapes route through the same surrogate scheme
    assert(one("ssn 123-45-6789 tel 919-555-1234",
      TextAnalysis.pseudonymizePii(col("text"))) ==
      s"ssn ${mk("123-45-6789")} tel ${mk("919-555-1234")}")
    // no PII -> text unchanged
    assert(one("keep v1.2 and 2023", TextAnalysis.pseudonymizePii(col("text"))) ==
      "keep v1.2 and 2023")
  }

  test("luhnValid: ISO 7812 checksum with the card length band") {
    def v(s: String): Boolean =
      one(s, TextAnalysis.luhnValid(col("text"))).asInstanceOf[Boolean]
    assert(v("4111111111111111"))          // classic valid Visa test number
    assert(v("5500000000000004"))          // valid Mastercard test number
    assert(!v("4111111111111112"))         // off-by-one checksum fails
    assert(!v("49927398716"))              // valid Luhn but 11 digits < 13
    // separator normalization feeds the validator
    assert(one("5500-0000-0000 0004",
      TextAnalysis.luhnValid(TextAnalysis.cardDigits(col("text"))))
      .asInstanceOf[Boolean])
  }

  test("ibanValid: ISO 13616 mod-97 with the length band and country prefix") {
    def v(s: String): Boolean =
      one(s, TextAnalysis.ibanValid(col("text"))).asInstanceOf[Boolean]
    assert(v("GB82WEST12345698765432"))       // the standard's own example
    assert(v("DE89370400440532013000"))       // valid German format
    assert(v("FR1420041010050500013M02606"))  // letter inside the BBAN
    assert(!v("GB82WEST12345678654321"))      // checksum off
    assert(!v("GB82WEST1234569876"))          // hand-check: remainder != 1
    assert(!v("1234567890123456"))            // no country prefix
    // letters in the ISO 13616 check-digit positions 3-4: this string
    // FOLDS to remainder 1 (brute-forced), so only the explicit
    // digits-only gate rejects it — standalone use must not depend on
    // the candidate regex having pre-filtered
    assert(!v("DEDXX0000000000000"))
  }

  test("subwordCount counts ceil(len/4) units per word") {
    // "distributed" (11 chars -> 3) + "db" (2 -> 1)
    assert(one("distributed db", TextAnalysis.subwordCount(col("text"))) == 4L)
  }

  test("decoratePage: lines of 8 words, bullet/ellipsis/period by (doc_id+i) mod") {
    // 17 words, doc_id=0 -> lines i=0,1,2; i=0: (0+0)%5==0 bullet;
    // i=1: %5!=0, (0+1)%7!=3 -> '.'; i=2: '.' as well
    val words = (1 to 17).map(n => s"w$n").mkString(" ")
    val page = Seq((0L, words)).toDF("doc_id", "text")
      .select(TextAnalysis.decoratePage(col("text"), col("doc_id")).as("p"))
      .collect().head.getString(0)
    val lines = page.split("\n")
    assert(lines.length == 3)
    assert(lines(0) == "- w1 w2 w3 w4 w5 w6 w7 w8")
    assert(lines(1) == "w9 w10 w11 w12 w13 w14 w15 w16.")
    assert(lines(2) == "w17.")
    // doc_id=3, i=0: (3+0)%7==3 -> ellipsis
    val p3 = Seq((3L, "a b")).toDF("doc_id", "text")
      .select(TextAnalysis.decoratePage(col("text"), col("doc_id")).as("p"))
      .collect().head.getString(0)
    assert(p3 == "a b...")
  }

  test("gopherSignals: exact counts and single-division fractions") {
    val page = "- alpha beta\nthe gamma delta is.\nepsilon zeta..."
    val r = Seq(page).toDF("text")
      .select(TextAnalysis.gopherSignals(col("text")).as("g"))
      .select("g.*").collect().head
    // words: -, alpha, beta, the, gamma, delta, is., epsilon, zeta...
    assert(r.getAs[Long]("n_words") == 9L)
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Double]("frac_bullet_lines") == 1.0 / 3.0)
    assert(r.getAs[Double]("frac_ellipsis_lines") == 1.0 / 3.0)
    // '-' has no alphabetic char -> 8/9 alpha words
    assert(r.getAs[Double]("frac_alpha_words") == 8.0 / 9.0)
    // uppercase-only words ARE alphabetic (Gopher: >=1 alphabetic char)
    val up = Seq("NASA nasa - 42").toDF("text")
      .select(TextAnalysis.gopherSignals(col("text")).as("g"))
      .select("g.*").collect().head
    assert(up.getAs[Double]("frac_alpha_words") == 2.0 / 4.0)
    // 'the' and 'is.'? 'is.' is not a stopword token ('is' is, with the
    // period glued it is not) -> only 'the' hits
    assert(r.getAs[Long]("n_stopword_hits") == 1L)
    assert(!r.getAs[Boolean]("passes")) // n_words < 25
  }

  test("c4Clean keeps punctuated >=5-word lines and flags blocklisted docs") {
    val page = "one two three four five six.\n- bullet line no period\n" +
      "short line.\nseven eight nine ten eleven twelve!"
    val r = Seq(page).toDF("text")
      .select(TextAnalysis.c4Clean(col("text")).as("c"))
      .select("c.*").collect().head
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("n_lines_kept") == 2L) // bullet: no punct; short: <5 words
    assert(!r.getAs[Boolean]("doc_kept")) // 2 < minKeptLines=3
    assert(r.getAs[String]("clean") ==
      "one two three four five six.\nseven eight nine ten eleven twelve!")
    val bad = Seq("a b c d e.\nf g h i j.\nk l m n o { bad }.")
      .toDF("text").select(TextAnalysis.c4Clean(col("text")).as("c"))
      .select("c.*").collect().head
    assert(bad.getAs[Long]("n_lines_kept") == 3L)
    assert(!bad.getAs[Boolean]("doc_kept")) // '{' blocklist
  }

  test("compressionRatios: repetition compresses, prose does not") {
    val spam = Array.fill(200)("click here now").mkString(" ")
    val prose = (1 to 120).map(i =>
      f"entry$i%03x ${(i * 2654435761L).toHexString}").mkString(" ")
    val df = Seq((1L, spam), (2L, prose), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatios(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 < 0.1, s"pure repetition must compress hard: ${out(1L)}")
    assert(out(2L)._3 > 3 * out(1L)._3, "diverse text compresses far less")
    assert(out(1L)._1 == spam.getBytes("UTF-8").length.toLong)
    assert(out(3L)._1 == 0L && out(3L)._2 > 0L) // deflate header still emitted
  }

  test("compressionRatios: deterministic across repartitionings") {
    val df = (1L to 60L).map(i => (i, s"doc $i " * (i % 7 + 1).toInt))
      .toDF("doc_id", "text")
    val a = TextAnalysis.compressionRatios(df.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.compressionRatios(df.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("readability: hand-computed Flesch scores; sentence and " +
      "syllable floors; empty text NULL") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "hello world."),          // 2 words, 1 sentence, 3 syllables
      (2L, "go now. stop here. ok"), // 5 words, 3 sentences, 6 syllables
      (3L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.readability(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.n_sentences"),
        col("r.n_syllables"), col("r.fre"), col("r.fk_grade"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val one = out(1L)
    assert(one.getLong(1) == 2 && one.getLong(2) == 1 && one.getLong(3) == 3)
    assert(one.getDouble(4) == 77.905 && one.getDouble(5) == 2.89)
    val two = out(2L)
    assert(two.getLong(1) == 5 && two.getLong(2) == 3 && two.getLong(3) == 6)
    assert(two.getDouble(4) == 103.623333 && two.getDouble(5) == -0.78)
    // zero words: counts zero (sentence floor still 1), NULL scores
    val z = out(3L)
    assert(z.getLong(1) == 0 && z.isNullAt(4) && z.isNullAt(5))
    // a vowel-free token still counts one syllable
    val v = df.sparkSession.sql("SELECT 'xyz pfft' AS text")
      .select(TextAnalysis.readability(col("text")).as("r"))
      .select(col("r.n_syllables")).collect().head.getLong(0)
    assert(v == 2)
  }
}
