package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(0.1f, -0.2f, 0.3f, 0.9f), Seq(0.5f, 0.4f, -0.3f, 0.2f)),
    (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(4.0f, 3.0f, 2.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("native dot is bit-identical to the fold formulation") {
    val rows = vecs.select(
      VectorExpressions.vec_dot(
        Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("native"),
      Similarity.foldDot(
        Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("fold"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native cosine matches dot/sqrt(n2*n2) composition bit-exactly") {
    val a = Similarity.asDouble(col("a")); val b = Similarity.asDouble(col("b"))
    val rows = vecs.select(
      VectorExpressions.cosine_sim(a, b).as("native"),
      (Similarity.foldDot(a, b) /
        sqrt(Similarity.foldDot(a, a) * Similarity.foldDot(b, b))).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native sqdist is bit-identical to the zip_with fold; real data agrees") {
    val a = Similarity.asDouble(col("a")); val b = Similarity.asDouble(col("b"))
    val rows = vecs.select(
      VectorExpressions.vec_sqdist(a, b).as("native"),
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _).as("fold"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // and across the 64-dim fixture corpus — every pair of the first 20
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("e"))
    val pairs = emb.toDF("ia", "ea").crossJoin(emb.toDF("ib", "eb"))
      .select(
        VectorExpressions.vec_sqdist(col("ea"), col("eb")).as("native"),
        aggregate(zip_with(col("ea"), col("eb"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _).as("fold"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("works directly on float arrays without cast") {
    val r = vecs.select(VectorExpressions.vec_dot(col("a"), col("b")).as("d"))
      .filter(col("d").isNotNull).count()
    assert(r == 2)
  }

  test("SQL registration (same builder GraftExtensions injects)") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorExpressions.CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.CosineSimilarity(args(0), args(1)))
    vecs.createOrReplaceTempView("vec_test")
    val out = spark.sql("SELECT cosine_sim(a, a) AS c FROM vec_test").collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("codegen path: no eval fallback in the plan") {
    val plan = vecs.select(VectorExpressions.cosine_sim(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("CodegenFallback"))
  }

  test("hashed_counts: dense occurrence counts match the SQL bucket formula") {
    import spark.implicits._
    val df = Seq((1L, "x x y")).toDF("id", "text")
    val out = df.select(graft.plans.SketchExpressions.hashed_counts(
        org.apache.spark.sql.functions.split(col("text"), " "), 8).as("f"))
      .collect().head.getSeq[Long](0)
    // replay the bucket hash exactly as the DuckDB oracle does
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 8).toInt
    }
    val expected = Array.fill(8)(0L)
    Seq("x", "x", "y").foreach(t => expected(bucket(t)) += 1)
    assert(out == expected.toSeq)
    assert(out.sum == 3) // occurrences, not distinct tokens
  }

  test("nfc_normalize composes combining marks; identity on NFC input") {
    val df = Seq(
      ("cafe\u0301", "caf\u00e9"), // decomposed -> precomposed
      ("plain ascii", "plain ascii"),
      ("caf\u00e9", "caf\u00e9") // already NFC: unchanged
    ).toDF("raw", "expected")
    val out = df.select(
      graft.plans.UnicodeExpressions.nfc_normalize(col("raw")).as("nfc"),
      col("expected")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
    // null propagates
    val n = Seq(Option.empty[String]).toDF("raw")
      .select(graft.plans.UnicodeExpressions.nfc_normalize(col("raw")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("fix_mojibake repairs double-encoding, conservative on everything else") {
    def fix(s: String): String =
      graft.plans.UnicodeExpressions.computeFixMojibake(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(fix("caf\u00c3\u00a9") == "caf\u00e9") // UTF-8-as-Latin-1 repaired
    assert(fix("plain ascii") == "plain ascii")
    assert(fix("90\u00b0") == "90\u00b0") // lone continuation byte: untouched
    // genuine single-encoded Latin-1 prose: 0xE9 alone is invalid UTF-8
    assert(fix("caf\u00e9") == "caf\u00e9")
    // mixed repairable + invalid: all-or-nothing leaves the WHOLE string
    assert(fix("caf\u00c3\u00a9 90\u00b0") == "caf\u00c3\u00a9 90\u00b0")
    // chars beyond Latin-1 mean real Unicode: untouched
    assert(fix("price \u20ac9") == "price \u20ac9")
  }

  test("zorder_key interleaves bits: a at even positions, b at odd") {
    import graft.plans.LayoutExpressions
    assert(LayoutExpressions.computeZOrder(0L, 0L) == 0L)
    assert(LayoutExpressions.computeZOrder(3L, 1L) == 7L) // 0b11 ⨯ 0b01 -> 0b0111
    assert(LayoutExpressions.computeZOrder(5L, 10L) == 153L)
    assert(LayoutExpressions.computeZOrder(0xFFFFL, 0L) == 0x55555555L)
    assert(LayoutExpressions.computeZOrder(0L, 0xFFFFL) == 0xAAAAAAAAL)
    // only the low 16 bits participate (callers quantize wider domains)
    assert(LayoutExpressions.computeZOrder(0x10000L, 0L) == 0L)
    // expression path agrees with the kernel
    val z = Seq((5L, 10L)).toDF("a", "b")
      .select(LayoutExpressions.zorder_key(col("a"), col("b")))
      .collect().head.getLong(0)
    assert(z == 153L)
    // locality: adjacent points land in the same high-bit bucket
    val k1 = LayoutExpressions.computeZOrder(100L, 200L)
    val k2 = LayoutExpressions.computeZOrder(101L, 201L)
    assert((k1 >> 8) == (k2 >> 8))
  }
}
