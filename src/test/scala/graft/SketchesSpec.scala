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

  test("kmvDistinct: exact below k, python-derived estimate at k=2, " +
      "duplicates invisible") {
    // fewer distinct values than k: the sketch IS the set -> exact
    val small = (1 to 10).map(_.toString).toDF("v")
    val rs = Sketches.kmvDistinct(small, "v", k = 256).collect().head
    assert(rs.getLong(1) == 10 && rs.getDouble(3) == 10.0 &&
      rs.getBoolean(4))
    // k=2 over {a,b,c}: second-smallest md5("kmv_"||v) hash is
    // 1722116737 -> est = 2^32/h2 = 2.494005
    val d = Seq("a", "b", "c", "a", "c").toDF("v")
    val r = Sketches.kmvDistinct(d, "v", k = 2).collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 1722116737L)
    assert(r.getDouble(3) == 2.494005 && r.getBoolean(4))
    // duplicates never move the sketch: same row as the dedup'd input
    val r2 = Sketches.kmvDistinct(Seq("a", "b", "c").toDF("v"), "v", k = 2)
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
