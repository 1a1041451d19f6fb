package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** On-cluster quality-classifier TRAINING — the other half of
  * [[graft.functions.TextAnalysis.linearScoreFixedPoint]]'s scoring
  * path: a batch perceptron over the hashed bag-of-words features,
  * kept ENTIRELY in 64-bit integers (weights, dot products, gradient
  * sums), so every training round is bit-reproducible across runs,
  * partitionings and engines — the training trajectory itself is
  * oracle-checkable, the same promise fixed-point PageRank makes.
  * (Float LR/SGD cannot: gradient contributions arrive in shuffle
  * order and double addition does not commute; SGD is additionally
  * sequential by definition. The batch perceptron update
  * w += Σ_misclassified y·x is order-free integer arithmetic.)
  *
  * Scale shape: each round is ONE map+aggregate pass over the corpus —
  * the filter (y·(w·x) ≤ 0) and the per-dimension gradient sums fuse
  * into the scan with map-side partials; nothing shuffles but the
  * dim-column partial rows. Driver state is `dim` int64s per round
  * (the DSIR / BPE bounded-model discipline); weights re-enter the
  * next round's plan as literals, so scoring stays codegen'd. */
object Classifier {

  /** Train `rounds` batch-perceptron updates from w=0 over
    * (`featCol`: array<bigint> of length `dim`, `labelCol`: ±1).
    * Returns the full weight trajectory: (round, weights) per round. */
  def trainPerceptron(docs: DataFrame, featCol: Column, labelCol: Column,
      dim: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of range")
    // featurize ONCE: the (x, y) projection is dim+1 integers per doc —
    // orders of magnitude smaller than the text it came from — so
    // persisting it across rounds is the right trade at any scale
    // (same reasoning as the persisted BPE word-frequency table;
    // without this every round re-tokenizes and re-hashes the corpus)
    val base = docs.select(featCol.as("x"), labelCol.cast("long").as("y"))
      .persist()
    val w = Array.fill(dim)(0L)
    val out = Seq.newBuilder[(Int, Seq[Long])]
    try {
      for (r <- 1 to rounds) {
        val dot = (0 until dim)
          .map(j => lit(w(j)) * element_at(col("x"), j + 1))
          .reduce(_ + _)
        val mis = base.filter(col("y") * dot <= 0)
        val aggs = (0 until dim).map(j =>
          sum(col("y") * element_at(col("x"), j + 1)).as(s"g$j"))
        val row = mis.agg(aggs.head, aggs.tail: _*).head()
        for (j <- 0 until dim)
          w(j) += (if (row.isNullAt(j)) 0L else row.getLong(j))
        out += ((r, w.toVector))
      }
      out.result()
    } finally base.unpersist()
  }
}
