package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins (the
  * training-data step that turns ragged documents into dense model
  * batches). Contiguous-fill policy: documents are taken in a
  * deterministic order and a document starting before a budget boundary
  * belongs to the bin of its starting offset — exactly the "concatenate
  * then split every `budget` tokens" packing used for LLM pretraining,
  * so bin contents are reproducible across engines and runs.
  *
  * Scale design: a single global running sum would serialize on one
  * task, so packing is SHARDED — an md5-derived shard key partitions
  * the corpus, each shard packs independently with a window cumulative
  * sum (shards are the parallelism unit), and bin ids are (shard, bin)
  * pairs. Shard count is the knob: ~one shard per executor core wave.
  * Within a shard docs are ordered by id — deterministic, not
  * arrival-order.
  */
object Packing {

  /** (shard, bin_idx, start_offset) per document. `shards = 1`
    * reproduces the strictly-sequential global packing. */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               budget: Long, shards: Int = 64): DataFrame = {
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("start_offset", col("__cum") - col(tokenCol))
      .withColumn("bin_idx", floor(col("start_offset") / budget).cast("long"))
      .drop("__cum")
  }

  /** Bin-level summary: rows per bin and token fill (fill > budget means
    * the last doc straddles the boundary — the downstream splitter cuts
    * it, as in concatenate-and-chunk pretraining pipelines). */
  def binStats(packed: DataFrame, tokenCol: String): DataFrame =
    packed.groupBy(col("shard"), col("bin_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))
}
