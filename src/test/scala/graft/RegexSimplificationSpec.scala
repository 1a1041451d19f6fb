package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

class RegexSimplificationSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq("abc", "abcd", "xabc", "ab", "zzz").toDF("k")

  // a non-local source: filters over LocalRelation constant-fold away
  // entirely, hiding the rewritten predicate from the plan string
  private lazy val stored = {
    val dir = Files.createTempDirectory("graft_rgx_src")
    df.write.mode("overwrite").parquet(dir.toString + "/t")
    spark.read.parquet(dir.toString + "/t")
  }

  private def optimized(pattern: String): String =
    stored.filter(col("k").rlike(pattern)).queryExecution.optimizedPlan.toString

  test("anchored literal patterns rewrite to string predicates") {
    assert(optimized("^abc$").contains("= abc"))
    assert(optimized("^abc").contains("StartsWith"))
    assert(optimized("abc$").contains("EndsWith"))
    assert(optimized("abc").contains("Contains"))
  }

  test("patterns with metacharacters are untouched") {
    assert(optimized("^ab[cd]$").contains("RLIKE"))
    assert(optimized("a.c").contains("RLIKE"))
    assert(optimized("_Statewide\\.zip$").contains("RLIKE"))
  }

  test("rewrite preserves RLIKE partial-match semantics") {
    for (p <- Seq("^abc$", "^abc", "abc$", "abc", "^ab")) {
      val simplified = df.filter(col("k").rlike(p)).collect().map(_.getString(0)).sorted
      // reference semantics via a regex evaluated in Scala
      val expected = Seq("abc", "abcd", "xabc", "ab", "zzz")
        .filter(s => p.r.findFirstIn(s).isDefined).sorted
      assert(simplified.toSeq == expected.toSeq, s"pattern $p")
    }
  }

  test("rewritten predicate pushes to the parquet scan") {
    val dir = Files.createTempDirectory("graft_rgx")
    df.write.mode("overwrite").parquet(dir.toString + "/t")
    val scan = spark.read.parquet(dir.toString + "/t")
      .filter(col("k").rlike("^ab"))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("StartsWith"), physical)
  }
}
