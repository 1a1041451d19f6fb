package graft

import org.apache.spark.sql.functions.col
import graft.core.Catalog

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    Catalog.resetDatabase(spark, "bkt")
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o_payload")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "i_payload")
    Catalog.saveBucketed(spark, "bkt", "orders", orders, Seq("key"), 4)
    Catalog.saveBucketed(spark, "bkt", "items", items, Seq("key"), 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt.orders").join(spark.table("bkt.items"), "key")
      assert(joined.count() == 3000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("bkt.items").groupBy("key").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
      assert(agg.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("persisted banded signatures: same pairs as minhashJoin, fewer exchanges") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words about distributed columnar query engines"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    val corpus = docs.filter("doc_id % 2 = 1")
    val batch = docs.filter("doc_id % 2 = 0")
    Catalog.scratchDatabase(spark, "incb")
    Dedup.persistBandedSignatures(spark, "incb", "sigs", corpus,
      "doc_id", "text", numBuckets = 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pre = Dedup.minhashJoinPrecomputed(batch, spark.table("incb.sigs"),
        Dedup.shingleSets(corpus, "doc_id", "text"), "doc_id", "text",
        threshold = 0.6)
      val plain = Dedup.minhashJoin(batch, corpus, "doc_id", "text",
        threshold = 0.6)
      // identical output contract
      val a = pre.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b && a.nonEmpty)
      // the bucketed corpus side needs NO exchange: the candidates join
      // shuffles only the probe batch — strictly fewer exchanges than the
      // compute-both-sides formulation (an upper bound, not an exact
      // count: planner changes must not fail the suite)
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)).length
      assert(exchanges(pre) < exchanges(plain),
        s"bucketed path should shuffle less: pre=${exchanges(pre)} plain=${exchanges(plain)}")
      // and the candidates really come from the stored bucketed table
      assert(pre.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).contains("incb.sigs"),
        "plan does not scan the persisted signature table")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned table: planning-time partition pruning on the filter") {
    Catalog.resetDatabase(spark, "prt")
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val df = days.zipWithIndex.flatMap { case (d, i) =>
      (1 to 10).map(j => (i * 10 + j, d))
    }.toDF("id", "day")
    Catalog.savePartitioned(spark, "prt", "events_p", df, Seq("day"))
    val q = spark.table("prt.events_p").filter(col("day") === "2024-01-02")
    assert(q.count() == 10)
    val scan = q.queryExecution.executedPlan.toString
    // partition filter present, and only one partition directory read
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-02"), scan)
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val update = Seq((991, "2024-01-02"), (992, "2024-01-02")).toDF("id", "day")
    Catalog.overwritePartitions(spark, "prt", "events_p", update)
    val byDay = spark.table("prt.events_p").groupBy("day").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay("2024-01-02") == 2)   // replaced
    assert(byDay("2024-01-01") == 10)  // untouched
    assert(byDay("2024-01-03") == 10)  // untouched
  }
}
