package graft

import org.apache.spark.sql.functions.col
import graft.operators.{Decontaminate, Sampling}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),   // contains benchmark 3-gram
    (2L, "one two three four five six"),           // clean
    (3L, "beta gamma delta something else entirely") // shares the same 3-gram
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "xxx beta gamma delta yyy")
  ).toDF("doc_id", "text")

  test("contaminated: per-doc collision counts against the benchmark") {
    val out = Decontaminate.contaminated(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 3L)) // doc 2 is clean
    assert(out(1L) == (1L, 1L)) // one shared gram ("beta_gamma_delta"), one test doc
    assert(out(3L) == (1L, 1L))
  }

  test("byEmbedding: near-copies of benchmark vectors are dropped, rest kept") {
    val trainVecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // identical to benchmark → drop
      (2L, Seq(0.99f, 0.05f, 0.0f, 0.0f)), // near-copy → drop
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))   // orthogonal → keep
    ).toDF("vec_id", "embedding")
    val evalVecs = Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val kept = Decontaminate.byEmbedding(trainVecs, evalVecs,
      "vec_id", "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("clean: anti-joins contaminated docs out, zero-tolerance default") {
    val kept = Decontaminate.clean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("contaminatedBloom: identical to exact contaminated, even undersized") {
    val exact = Decontaminate.contaminated(train, bench, "doc_id", "text", n = 3)
      .collect().map(_.toString).sorted.toSeq
    val bloom = Decontaminate.contaminatedBloom(train, bench, "doc_id", "text", n = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(bloom == exact)
    // a deliberately undersized filter (high fpp) lets more docs through
    // the pre-filter but the exact join must still give the same answer
    val tiny = Decontaminate.contaminatedBloom(train, bench, "doc_id", "text",
      n = 3, expectedGrams = 4, fpp = 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(tiny == exact)
  }

  test("bloom_hits: no false negatives; zero hits for disjoint grams") {
    import graft.plans.BloomExpressions
    val values = Seq("a_b", "c_d", "e_f").toDF("gram")
    val bf = BloomExpressions.buildBloom(values, "gram", expectedItems = 100)
    val probe = Seq(
      (1L, Seq("a_b", "zz")),   // one true member
      (2L, Seq("qq", "rr"))     // none
    ).toDF("id", "grams")
    val hits = probe.select(col("id"),
        BloomExpressions.bloom_hits(col("grams"), bf).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hits(1L) >= 1)       // membership can never be missed
    // 100-capacity filter on 3 items: fp odds for 2 probes ~ 0
    assert(hits(2L) == 0)
  }

  test("temperature resampling flattens group proportions, deterministically") {
    val df = ((1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small")))
      .toDF("id", "grp")
    val out = Sampling.temperatureResample(df, "grp", col("id"), alpha = 0.5)
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0.5: big keeps ~sqrt(100/900)=1/3 of 900 = ~300; small keeps all-ish
    assert(counts("big") > 200 && counts("big") < 400)
    assert(counts("small") > 80)
    // deterministic + a subset of the input
    val again = Sampling.temperatureResample(df, "grp", col("id"), alpha = 0.5)
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
    // alpha=1 keeps everything
    assert(Sampling.temperatureResample(df, "grp", col("id"), alpha = 1.0).count() == 1000)
  }

  test("stratified sampling: exact per-stratum counts, deterministic") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Sampling.stratified(df, Seq("grp"), col("id"), perStratum = 5)
    val s2 = Sampling.stratified(df, Seq("grp"), col("id"), perStratum = 5)
    val byGrp = s1.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("a" -> 5L, "b" -> 5L))
    // deterministic: same rows every run
    assert(s1.collect().map(_.toString).sorted.toSeq ==
      s2.collect().map(_.toString).sorted.toSeq)
    // small stratum: returns all of it, not an error
    val tiny = Sampling.stratified(df.filter(col("id") <= 2), Seq("grp"),
      col("id"), perStratum = 5)
    assert(tiny.count() == 2)
  }
}
