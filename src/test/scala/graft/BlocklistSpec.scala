package graft

import org.apache.spark.sql.functions._
import graft.plans.BlocklistExpressions
import org.apache.spark.unsafe.types.UTF8String

/** Hand-computed anchors for the Aho-Corasick blocklist matcher — the
  * oracle mirrors the same definition, so these literal cases are what
  * pins the semantics. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, dict: Seq[String]): Long =
    new BlocklistExpressions.AhoCorasick(dict)
      .countMatches(UTF8String.fromString(text))

  test("counts every match position: overlaps and suffix patterns fire") {
    // 'aba' overlaps itself in 'ababa' -> 2
    assert(count("ababa", Seq("aba")) === 2L)
    // 'he' fires inside 'she' AND standalone; 'she' fires once
    assert(count("she", Seq("he", "she")) === 2L)
    assert(count("the shed", Seq("he", "she")) === 3L) // t[he] s[he]+[she]
    // disjoint dictionary, no hits
    assert(count("clean text", Seq("lorem ipsum", "click here")) === 0L)
    // multi-word phrase matches across spaces
    assert(count("x lorem ipsum y", Seq("lorem ipsum")) === 1L)
    // empty text
    assert(count("", Seq("a")) === 0L)
  }

  test("SQL surface: round-5/6 kernels resolve through GraftExtensions") {
    val r = spark.sql(
      "SELECT blocklist_hits('she sells ababa', array('she','he','aba')) AS bl, " +
        "nfc_normalize('cafe\u0301') AS n, " +
        "fix_mojibake('caf\u00c3\u00a9') AS m, " +
        "decode_html_entities('A&#66;C &#x44;') AS d, " +
        "zorder_key(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS z").head()
    assert(r.getLong(0) === 4L)
    assert(r.getString(1) === "caf\u00e9") // decomposed e+U+0301 -> NFC
    assert(r.getString(2) === "caf\u00e9") // UTF-8-as-Latin-1 repaired
    assert(r.getString(3) === "ABC D")
    // a=3 -> even bit positions 0,2 = 5; b=5 -> odd positions 1,5 = 34
    assert(r.getLong(4) === 39L)
  }

  test("SQL surface: non-foldable or non-array dictionary is a clean analysis error") {
    import org.apache.spark.sql.AnalysisException
    // a column reference is not a foldable dictionary
    val e1 = intercept[AnalysisException] {
      Seq(("x", "she")).toDF("t", "d")
        .createOrReplaceTempView("bl_bad")
      spark.sql("SELECT blocklist_hits(t, array(d)) FROM bl_bad").collect()
    }
    assert(e1.getMessage.contains("foldable array-of-strings"))
    // a scalar literal is not an array
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT blocklist_hits('x', 'she')").collect()
    }
    assert(e2.getMessage.contains("foldable array-of-strings"))
  }

  test("expression evaluates in a codegen'd plan, zero shuffle") {
    val df = Seq((1L, "she sells ababa"), (2L, "nothing")).toDF("id", "t")
      .select(col("id"),
        BlocklistExpressions.blocklist_hits(col("t"), Seq("she", "he", "aba"))
          .as("n"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) === 4L) // she + he(in she) + aba x2
    assert(rows(2L) === 0L)
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"blocklist gate must be a map pass:\n$p")
    assert(!p.contains("CodegenFallback"),
      "blocklist_hits must participate in codegen")
  }
}
