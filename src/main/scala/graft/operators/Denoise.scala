package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Denoising-objective materialization (T5 / UL2 span corruption,
  * Raffel et al. 2020 §3.1.4): aligned blocks of token positions are
  * deterministically selected, each selected block collapses to ONE
  * sentinel token in the input stream, and contributes
  * (sentinel, original tokens…) to the target stream — the
  * (inputs, targets) example pair a denoising dataloader feeds the
  * model, built on-cluster from the REAL BPE id stream.
  *
  * Everything is per-row array arithmetic over the already-encoded
  * ids: ZERO shuffle (the whole transform fuses into the scan), and
  * the block draw is the library's salted md5 uniform
  * ([[Sampling.hash32]] discipline, salt `mask_`), so the corruption
  * pattern is reproducible across runs, partitionings and engines —
  * the training EXAMPLES themselves are oracle-checkable, not just
  * their counts.
  *
  * Sentinels are `vocabSize + spanOrdinal` (T5's `<extra_id_k>`),
  * ordinals counted left-to-right per doc. Block length `blockLen`
  * positions; a block is masked with probability 1/`maskEvery`. The
  * final partial block participates like any other (its slice is just
  * shorter). No terminal sentinel is appended (documented deviation
  * from T5's trailing `<extra_id_k+1>` — a fixed convention either
  * way, and the simpler one replays cleanly in SQL).
  */
object Denoise {

  /** struct(input_ids, target_ids, n_spans) for one doc's id array.
    * `ids` must be the flat BPE stream ([[Bpe.encode]]'s `bpe_ids`);
    * `docId` keys the deterministic draw. */
  def spanCorrupt(ids: Column, docId: Column, vocabSize: Long,
      blockLen: Int = 8, maskEvery: Int = 5,
      salt: String = "mask_"): Column = {
    val n = size(ids)
    val nBlocks = ceil(n.cast("double") / blockLen).cast("long")
    val blockIdx = sequence(lit(0L), greatest(nBlocks - 1, lit(0L)))
    def masked(b: Column): Column =
      pmod(Sampling.hash32(concat(docId.cast("string"), lit("_"),
        b.cast("string")), salt), lit(maskEvery.toLong)) === 0
    // span ordinal of block b = count of masked blocks before b —
    // O(nBlocks²) in expression land, but nBlocks is tokens/blockLen
    // per DOC (tens), never corpus-scale
    // guard b=0: Spark's sequence(0, -1) yields a DESCENDING ramp,
    // not empty (same gotcha as Bpe's single-symbol words)
    def ordinal(b: Column): Column =
      when(b === 0, lit(0L))
        .otherwise(size(filter(sequence(lit(0L), b - 1), p => masked(p)))
          .cast("long"))
    def blockSlice(b: Column): Column =
      slice(ids, (b * blockLen + 1).cast("int"), lit(blockLen))
    val inputIds = flatten(transform(blockIdx, b =>
      when(n === 0, array().cast("array<bigint>"))
        .when(masked(b), array(lit(vocabSize) + ordinal(b)))
        .otherwise(blockSlice(b))))
    val targetIds = flatten(transform(blockIdx, b =>
      when(n === 0 || !masked(b), array().cast("array<bigint>"))
        .otherwise(concat(array(lit(vocabSize) + ordinal(b)), blockSlice(b)))))
    val nSpans = when(n === 0, lit(0L))
      .otherwise(size(filter(blockIdx, b => masked(b))).cast("long"))
    struct(inputIds.as("input_ids"), targetIds.as("target_ids"),
      nSpans.as("n_spans"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022 — the
    * infilling objective code models train on): split the id stream at
    * two deterministic points into (prefix, middle, suffix) and emit
    * the PSM reordering `[PRE] prefix [SUF] suffix [MID] middle`, so a
    * causal model learns to complete a middle given both sides.
    * Sentinels are vocabSize+0/1/2 (PRE/SUF/MID). Split points are the
    * `fim_`-salted uniform draw mapped into [0, n]: lo = draw1 % (n+1),
    * hi = lo + draw2 % (n - lo + 1) — both ends inclusive-exclusive,
    * degenerate (empty) segments allowed, exactly replayable in SQL.
    * Zero-shuffle array arithmetic like [[spanCorrupt]]. */
  def fim(ids: Column, docId: Column, vocabSize: Long,
      salt: String = "fim_"): Column = {
    val n = size(ids).cast("long")
    def draw(tag: String): Column =
      Sampling.hash32(concat(docId.cast("string"), lit(tag)), salt)
    val lo = pmod(draw("_a"), n + 1)
    val hi = lo + pmod(draw("_b"), n - lo + 1)
    val pre = slice(ids, lit(1), lo.cast("int"))
    val mid = slice(ids, (lo + 1).cast("int"), (hi - lo).cast("int"))
    val suf = slice(ids, (hi + 1).cast("int"), (n - hi).cast("int"))
    val out = concat(
      array(lit(vocabSize)), pre,
      array(lit(vocabSize + 1)), suf,
      array(lit(vocabSize + 2)), mid)
    struct(out.as("fim_ids"), lo.as("fim_lo"), hi.as("fim_hi"))
  }
}
