package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("hashedImportance: target == corpus gives importance exactly 1.0") {
    val df = Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"),
      (3L, "zeta"), (4L, "alpha alpha beta"))
      .toDF("doc_id", "text")
    val out = Importance.hashedImportance(df, "doc_id", "text",
      isTarget = lit(true), dim = 8)
      .select("doc_id", "importance").as[(Long, Double)].collect()
    // every bucket's target total equals its raw total, so num/den are
    // the same exact integers — the ratio is exactly 1.0, no tolerance
    assert(out.length == 4 && out.forall(_._2 == 1.0))
  }

  test("hashedImportance: docs of target-typical tokens score above raw-typical") {
    // target docs repeat 'tok_t'; raw-only docs repeat 'tok_r'. With a
    // hash featurizer the two words land in (almost surely) different
    // buckets at dim=64, so target-token docs must score > 1 > raw-only
    val docs = ((1L to 20L).map(i => (i, "tok_t tok_t tok_t", true)) ++
      (21L to 40L).map(i => (i, "tok_r tok_r tok_r", false)))
      .toDF("doc_id", "text", "is_t")
    val out = Importance.hashedImportance(docs, "doc_id", "text",
      col("is_t"), dim = 64)
      .select("doc_id", "importance").as[(Long, Double)].collect().toMap
    assert((1L to 20L).forall(out(_) > 1.0), "target-typical docs should score > 1")
    assert((21L to 40L).forall(out(_) < 1.0), "raw-only docs should score < 1")
  }

  test("resampleByImportance: exactly keep rows, stable across repartitioning") {
    val docs = ((1L to 30L).map(i => (i, "aa bb cc", i <= 10)))
      .toDF("doc_id", "text", "is_t")
    val a = Importance.resampleByImportance(docs.repartition(7), "doc_id",
      "text", col("is_t"), keep = 12)
      .select("doc_id").as[Long].collect().toSet
    val b = Importance.resampleByImportance(docs.coalesce(1), "doc_id",
      "text", col("is_t"), keep = 12)
      .select("doc_id").as[Long].collect().toSet
    assert(a.size == 12 && a == b)
  }
}
