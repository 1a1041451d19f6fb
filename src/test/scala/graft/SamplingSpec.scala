package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("globalShuffle: ranks equal the naive global-window formulation") {
    val df = (1L to 257L).toDF("k")
    val got = Sampling.globalShuffle(df, col("k"), numPartitions = 7)
      .select("k", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("shuffle_pos",
        row_number().over(Window.orderBy(md5(col("k").cast("string")),
          col("k").cast("string"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalShuffle: permutation is a bijection onto [1, N], even with empty partitions") {
    val df = (1L to 10L).toDF("k")
    val pos = Sampling.globalShuffle(df, col("k"), numPartitions = 32)
      .select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (1L to 10L))
  }

  test("globalShuffle: stable across repartitionings of the input") {
    val df = (1L to 100L).toDF("k")
    val a = Sampling.globalShuffle(df.repartition(13), col("k"))
      .select("k", "shuffle_pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.globalShuffle(df.coalesce(1), col("k"))
      .select("k", "shuffle_pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("mixtureWeights: shares sum to 1, uniform target weight is total/(G*n)") {
    // groups of 1, 3 and 4 units → total 8, G = 3
    val df = Seq(("a", 1L), ("b", 3L), ("c", 4L)).toDF("g", "units")
    val out = Sampling.mixtureWeights(df, "g", col("units"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") == (1L, 1.0 / 8.0, 8.0 / 3.0))
    assert(out("b") == (3L, 3.0 / 8.0, 8.0 / 9.0))
    assert(out("c") == (4L, 4.0 / 8.0, 8.0 / 12.0))
    assert(out.values.map(_._2).sum == 1.0)
  }
}
