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

  test("prefix-anchored and bare literal patterns rewrite to string predicates") {
    assert(optimized("^abc").contains("StartsWith"))
    assert(optimized("abc").contains("Contains"))
  }

  test("patterns with metacharacters or $ anchors are untouched") {
    assert(optimized("^ab[cd]$").contains("RLIKE"))
    assert(optimized("a.c").contains("RLIKE"))
    assert(optimized("_Statewide\\.zip$").contains("RLIKE"))
    // java.util.regex `$` also matches before a final line terminator,
    // so EndsWith/EqualTo rewrites would change results on "p\n" values
    assert(optimized("abc$").contains("RLIKE"))
    assert(optimized("^abc$").contains("RLIKE"))
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

  test("$-anchored values with trailing newline keep regex semantics") {
    // "abc\n" must match 'abc$' (Java $ matches before the final \n);
    // an EndsWith rewrite would drop it — pin that we do NOT rewrite
    val vals = Seq("abc", "abc\n", "abcX").toDF("k")
    val got = vals.filter(col("k").rlike("abc$")).collect().map(_.getString(0)).toSet
    assert(got == Set("abc", "abc\n"))
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
