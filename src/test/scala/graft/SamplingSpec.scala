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
}
