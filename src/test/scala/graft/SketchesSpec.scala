package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
    (1 to 30).map(i => s"rare$i")

  test("count-min never underestimates and is exact absent collisions") {
    val tok = tokens.toDF("t")
    val sketch = Sketches.countMin(tok, "t", d = 4, w = 1024)
    val exact = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val est = Sketches.countMinEstimate(sketch, exact.select("t"), "t",
      d = 4, w = 1024)
    val joined = exact.join(est, "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    joined.foreach { case (t, c, e) =>
      assert(e >= c, s"CMS underestimated $t: $e < $c")
    }
    // 100 tokens into 4×1024 buckets: overwhelmingly collision-free,
    // and the heavy terms' estimates are exact on this fixture
    val m = joined.map(x => x._1 -> x._3).toMap
    assert(m("alpha") == 50L && m("beta") == 20L)
  }

  test("count-min sketch size is d rows × ≤ w buckets regardless of input size") {
    val big = (1L to 5000L).map(i => s"tok$i").toDF("t")
    val sketch = Sketches.countMin(big, "t", d = 3, w = 64)
    assert(sketch.select("row").distinct().count() == 3)
    assert(sketch.count() <= 3 * 64)
    // cell mass per row equals the input size (every token lands once per row)
    val rowMass = sketch.groupBy("row").agg(sum("cnt").as("m"))
      .collect().map(_.getLong(1))
    assert(rowMass.forall(_ == 5000L))
  }

  test("count-min merges across corpora by cell-wise addition") {
    val a = Seq("x", "x", "y").toDF("t")
    val b = Seq("x", "z").toDF("t")
    val merged = Sketches.countMin(a, "t").unionByName(Sketches.countMin(b, "t"))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMin(a.unionByName(b), "t")
    assert(merged.orderBy("row", "bucket").collect().toSeq ==
      whole.orderBy("row", "bucket").collect().toSeq)
  }
}
