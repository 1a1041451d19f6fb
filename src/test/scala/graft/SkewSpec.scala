package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum == plain groupBy sum (decomposable aggregate identity)") {
    val df = (1L to 2000L).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(df, Seq("k"), $"v", $"v", "s", saltFactor = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin == plain join (row multiset identity incl. fact duplicates)") {
    val facts = ((1L to 500L).map(i => ("hot", i)) ++ Seq(("a", 900L), ("a", 901L), ("b", 902L)))
      .toDF("k", "v")
    val build = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U"))
      .toDF("k", "attr")
    val plain = facts.join(build, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(facts, build, "k", $"v", saltFactor = 8)
      .select("k", "v", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
