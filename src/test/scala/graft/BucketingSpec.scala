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
}
