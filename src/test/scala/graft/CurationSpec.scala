package graft

import org.apache.spark.sql.functions.col
import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the cat sat on a mat and the dog ran to the park " +
    "with a ball and a stick while the sun was up in the sky over the town"

  private def docs = Seq(
    (1L, good),                                        // survives
    (2L, good),                                        // exact dup of 1 -> dropped
    (3L, good + " extra tail words here today"),       // near dup of 1 -> dropped
    (4L, "zz zz zz zz zz zz zz zz zz zz"),             // repetitive junk -> gated
    (5L, "the web site is a good place to read " +
      "about the many things that people make"),       // survives
    (6L, "mail me at someone@example.com " + good)     // PII redacted, near dup -> dropped
  ).toDF("doc_id", "text")

  test("full curation run: gates, exact+near dedup, redaction compose") {
    val out = Curation.run(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.3))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(2L)) // min-id exact survivor
    assert(!ids.contains(3L))                     // near-dup cluster collapsed
    assert(!ids.contains(4L))                     // repetition gate
    assert(ids.contains(5L))
    val texts = out.select("clean_text").collect().map(_.getString(0))
    assert(texts.forall(!_.contains("example.com"))) // PII gone everywhere
  }

  test("blocklist stage drops dictionary-hit docs in the map-gate pass") {
    val corpus = Seq(
      (1L, good),
      (2L, good + " win a prize now today it is here"),
      (3L, "the web site is a good place to read about many fine things")
    ).toDF("doc_id", "text")
    val out = Curation.run(corpus, "doc_id", "text",
      Curation.Config(minQuality = 0.3, nearDupThreshold = None,
        blocklist = Seq("win a prize", "lorem ipsum")))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L)) // doc 2 hits 'win a prize'
  }

  test("decontamination stage drops docs overlapping the benchmark") {
    val bench = Seq((100L, "the dog ran to the park with a ball"))
      .toDF("doc_id", "text")
    val out = Curation.run(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.3, benchmark = Some(bench),
        decontaminateNgram = 5))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L)) // shares 5-grams with the benchmark
    assert(ids.contains(5L))  // clean of benchmark overlap
  }

  test("passage-dedup stage strips cross-document boilerplate from survivors") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma unique one text here now"),
      (2L, "alpha beta gamma other words follow in this doc")
    ).toDF("doc_id", "text")
    val out = Curation.run(corpus, "doc_id", "text",
      Curation.Config(redact = false, minQuality = 0.0,
        maxTopNgramFrac = 1.0, maxRepTokenFrac = 1.0,
        exactDedup = false, nearDupThreshold = None,
        passageDedupTokens = Some(3)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out(1L) == "alpha beta gamma unique one text here now")
    // doc 2's first passage "alpha beta gamma" was already written by doc 1
    assert(out(2L) == "other words follow in this doc")
  }

  test("boilerplate stage removes template passages before the gates") {
    val corpus = Seq(
      (1L, "src1", "click here now alpha beta gamma"),
      (2L, "src1", "click here now delta epsilon zeta"),
      (3L, "src1", "click here now eta theta iota"),
      (4L, "src1", "kappa lambda mu nu xi omicron")
    ).toDF("doc_id", "source", "text")
    val out = Curation.run(corpus, "doc_id", "text",
      Curation.Config(redact = false, minQuality = 0.0,
        maxTopNgramFrac = 1.0, maxRepTokenFrac = 1.0,
        exactDedup = false, nearDupThreshold = None,
        boilerplate = Some(("source", 3, 3))))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out(1L) == "alpha beta gamma")     // template stripped
    assert(out(4L) == "kappa lambda mu nu xi omicron") // untouched
  }

  test("dup-span stage cuts cross-document repeated runs from survivors") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over it alpha beta gamma"),
      (2L, "prefix words the quick brown fox jumps over it suffix"),
      (3L, "totally unrelated content with its own distinct words")
    ).toDF("doc_id", "text")
    val out = Curation.run(corpus, "doc_id", "text",
      Curation.Config(redact = false, minQuality = 0.0,
        maxTopNgramFrac = 1.0, maxRepTokenFrac = 1.0,
        exactDedup = false, nearDupThreshold = None,
        dupSpanTokens = Some(7)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    // "the quick brown fox jumps over it" (7 tokens) recurs → cut everywhere
    assert(out(1L) == "alpha beta gamma")
    assert(out(2L) == "prefix words suffix")
    assert(out(3L) == "totally unrelated content with its own distinct words")
  }

  test("stages are individually skippable") {
    val out = Curation.run(docs, "doc_id", "text",
      Curation.Config(redact = false, minQuality = 0.0,
        maxTopNgramFrac = 1.0, maxRepTokenFrac = 1.0,
        exactDedup = false, nearDupThreshold = None))
    assert(out.count() == 6) // nothing filtered
    val t6 = out.filter(col("doc_id") === 6L).select("clean_text")
      .collect().head.getString(0)
    assert(t6.contains("someone@example.com")) // redaction skipped
  }

  test("secretScan: entropy flags random-ish keys, spares repeated chars") {
    val docs = Seq(
      (1L, "short words only here"),
      (2L, "prefix abcdefghijklmnopqrst suffix"),
      (3L, "padding aaaaaaaaaaaaaaaaaaaaaaaa end"),
      (4L, "also abcdefghijklmnopqrst again")
    ).toDF("doc_id", "text")
    val out = Curation.secretScan(docs, "doc_id", "text", minLen = 20,
      minBits = 3.5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.length == 3, "three candidate occurrences")
    val byDoc = out.map(t => t._1 -> t).toMap
    // 20 distinct chars: H = round(log2(20), 9) -> 4.321928
    assert(byDoc(2L)._4 == 4.321928 && byDoc(2L)._5)
    assert(byDoc(4L)._4 == 4.321928 && byDoc(4L)._5, "Zipf join-back")
    assert(byDoc(3L)._4 == 0.0 && !byDoc(3L)._5, "zero-entropy run")
  }

  test("secretScan: deterministic across repartitionings") {
    val docs = (1L to 200L).map(i =>
      (i, s"t ${java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString}"))
      .toDF("doc_id", "text")
    val a = Curation.secretScan(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = Curation.secretScan(docs.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
