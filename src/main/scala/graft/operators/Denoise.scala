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
    // guard: Spark's sequence(0, -1) yields a DESCENDING ramp, not
    // empty (same gotcha as Bpe's single-symbol words)
    val blockIdx = sequence(lit(0L), greatest(nBlocks - 1, lit(0L)))
    def masked(b: Column): Column =
      pmod(Sampling.hash32(concat(docId.cast("string"), lit("_"),
        b.cast("string")), salt), lit(maskEvery.toLong)) === 0
    // The salted-md5 draw is evaluated ONCE per block and shared by
    // all three outputs (pre-round-7 each output re-derived it, and
    // the per-block ordinal re-filtered sequence(0, b-1) — O(nBlocks²)
    // hash evaluations, quadratic wall time on 100k-token docs).
    val maskArr = transform(blockIdx, b => masked(b))
    // ordinals[b] = count of masked blocks BEFORE b, built in one
    // cumulative fold over the mask array. The running concat still
    // copies O(nBlocks²) array cells, but those are plain long moves —
    // the md5 work, the actual constant, is linear now (DenoiseSpec
    // pins a 1k-block doc completing in bounded time).
    val ordinals = aggregate(maskArr,
      struct(array().cast("array<bigint>").as("arr"), lit(0L).as("cnt")),
      (acc, m) => struct(
        concat(acc.getField("arr"), array(acc.getField("cnt"))).as("arr"),
        (acc.getField("cnt") + when(m, lit(1L)).otherwise(lit(0L)))
          .as("cnt")),
      acc => acc.getField("arr"))
    // zip mask+ordinal BEFORE the per-block lambdas: a lambda body
    // referencing the fold would re-evaluate it per element (invariant
    // subtrees are not hoisted out of higher-order-function lambdas);
    // as a zip_with ARGUMENT it is evaluated once per row.
    val maskOrd = zip_with(maskArr, ordinals,
      (m, o) => struct(m.as("m"), o.as("o")))
    def blockSlice(i: Column): Column =
      slice(ids, (i.cast("long") * blockLen + 1).cast("int"), lit(blockLen))
    val inputIds = flatten(transform(maskOrd, (s, i) =>
      when(n === 0, array().cast("array<bigint>"))
        .when(s.getField("m"), array(lit(vocabSize) + s.getField("o")))
        .otherwise(blockSlice(i))))
    val targetIds = flatten(transform(maskOrd, (s, i) =>
      when(n === 0 || !s.getField("m"), array().cast("array<bigint>"))
        .otherwise(concat(array(lit(vocabSize) + s.getField("o")),
          blockSlice(i)))))
    val nSpans = when(n === 0, lit(0L))
      .otherwise(size(filter(maskArr, m => m)).cast("long"))
    struct(inputIds.as("input_ids"), targetIds.as("target_ids"),
      nSpans.as("n_spans"))
  }

  /** Corpus-scale span-corruption materialization — [[spanCorrupt]]'s
    * algebra on the measured explode shape (the chrF / mlmMask
    * lesson): positions become rows via a codegen `posexplode`, the
    * block draw runs in whole-stage codegen, the span ORDINAL (the one
    * cross-row quantity) is a doc-partitioned running sum — after the
    * up-front `repartition(docId)` both the window and the final
    * rebuild groupBy are EXCHANGE-FREE, so the whole plan has ONE
    * shuffle of the raw id rows. Each position row then emits its 1-3
    * output entries (tag 0 = input stream, 1 = target; subkey k orders
    * a span's sentinel before its tokens at the same position), and
    * one aggregate rebuilds both arrays via codegen
    * `GetArrayStructFields` — no interpreted lambda anywhere.
    *
    * Draw algebra is bit-identical to [[spanCorrupt]] (same salt, same
    * hash32 over (docId, blockIdx), ordinal = masked blocks before
    * mine): `q_span_corrupt` kept its oracle hash across the swap.
    * Returns (doc_id, input_ids, target_ids, n_spans). */
  def spanCorruptExamples(df: org.apache.spark.sql.DataFrame,
      idsCol: String, docIdCol: String, vocabSize: Long,
      blockLen: Int = 8, maskEvery: Int = 5, salt: String = "mask_")
      : org.apache.spark.sql.DataFrame = {
    val pos = df.repartition(col(docIdCol))
      .select(col(docIdCol).as("doc_id"),
        posexplode_outer(col(idsCol)).as(Seq("i", "t")))
    val b = expr(s"CAST(i div $blockLen AS BIGINT)")
    val masked = pmod(Sampling.hash32(concat(col("doc_id").cast("string"),
      lit("_"), b.cast("string")), salt), lit(maskEvery.toLong)) === 0
    val isStart = pmod(col("i"), lit(blockLen)) === 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // running count of masked block STARTS at or before position i:
    // inside a masked block this is (my span ordinal + 1), constant
    // from the block's start on — so sentinel = vocab + cum − 1
    val withOrd = pos.withColumn("m", masked)
      .withColumn("cum",
        sum(when(isStart && masked, 1L).otherwise(0L)).over(w))
    val sent = lit(vocabSize) + col("cum") - 1L
    def entry(tag: Int, k: Int, v: Column) =
      struct(lit(tag).as("tag"), col("i").as("i"), lit(k).as("k"),
        v.cast("long").as("v"))
    val entries =
      when(col("i").isNull,
        array().cast("array<struct<tag:int,i:int,k:int,v:bigint>>"))
        .when(!col("m"), array(entry(0, 1, col("t"))))
        .when(col("m") && isStart, array(
          entry(0, 0, sent), entry(1, 0, sent), entry(1, 1, col("t"))))
        .otherwise(array(entry(1, 1, col("t"))))
    withOrd.select(col("doc_id"), explode_outer(entries).as("e"))
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(when(col("e.tag") === 0,
          struct(col("e.i"), col("e.k"), col("e.v"))))).as("ia"),
        sort_array(collect_list(when(col("e.tag") === 1,
          struct(col("e.i"), col("e.k"), col("e.v"))))).as("ta"),
        sum(when(col("e.tag") === 1 && col("e.k") === 0, 1L)
          .otherwise(0L)).as("ns"))
      .select(col("doc_id"),
        col("ia.v").as("input_ids"),
        col("ta.v").as("target_ids"),
        coalesce(col("ns"), lit(0L)).as("n_spans"))
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

  /** BERT-style masked-LM example materialization (Devlin et al. 2019
    * §3.1 — the third member of the objectives family after T5 span
    * corruption and FIM): `maskPercent`% of token POSITIONS are
    * selected by the salted-md5 uniform; a selected position becomes
    * the [MASK] sentinel (= vocabSize) with probability 0.8, a
    * hash-drawn REAL vocab id with 0.1 (possibly the original — the
    * standard recipe accepts that), and keeps its token with 0.1.
    * `labels` carries the original id at selected positions and −100
    * elsewhere (the ignore_index convention shared with
    * [[PostTraining.lossMask]]). Returns
    * struct(input_ids, labels, n_masked).
    *
    * Zero-shuffle per-row array arithmetic like [[spanCorrupt]]; the
    * three draws are [[Sampling.hash32]] over (docId, position) under
    * distinct salts (`mlm_` select, `mlmr_` 80/10/10 split, `mlmv_`
    * replacement id), so the exact example — not just its mask rate —
    * replays in SQL. */
  def mlmMask(ids: Column, docId: Column, vocabSize: Long,
      maskPercent: Int = 15): Column = {
    require(maskPercent >= 1 && maskPercent <= 99,
      s"maskPercent=$maskPercent out of range")
    // NOTE (plan): this Column form runs its three md5 draws inside
    // interpreted `transform` lambdas — ~10× codegen for the identical
    // algebra (the chrF lesson). It remains the convenient per-row API
    // for small/spec use; the corpus-scale path is [[mlmMaskExamples]],
    // whose draws are bit-identical (same salts, same hash32).
    def h(salt: String, i: Column) = Sampling.hash32(
      concat(docId.cast("string"), lit("_"), i.cast("string")), salt)
    def selected(i: Column) = pmod(h("mlm_", i), lit(100L)) < maskPercent
    val inputIds = transform(ids, (t, i) => {
      val sub = pmod(h("mlmr_", i), lit(10L))
      when(!selected(i), t)
        .when(sub < 8, lit(vocabSize))
        .when(sub === 8, pmod(h("mlmv_", i), lit(vocabSize)))
        .otherwise(t)
    })
    val labels = transform(ids, (t, i) =>
      when(selected(i), t).otherwise(lit(-100L)))
    struct(inputIds.as("input_ids"), labels.as("labels"),
      size(filter(labels, x => x =!= lit(-100L))).cast("long").as("n_masked"))
  }

  /** Corpus-scale MLM materialization — [[mlmMask]]'s algebra on the
    * measured chrF plan shape: positions become ROWS via a codegen
    * `posexplode` Generate, every salted-md5 draw runs inside
    * whole-stage codegen (never an interpreted lambda), and the
    * example arrays are rebuilt by ONE doc-keyed aggregate whose
    * field extraction is `GetArrayStructFields` (codegen), not a
    * lambda. The input is `repartition(docId)` BEFORE generation, so
    * the rebuild groupBy is EXCHANGE-FREE (HashPartitioning already
    * satisfies its distribution) — only the original id rows are ever
    * hashed across the wire, once.
    *
    * Draw algebra is bit-identical to [[mlmMask]] (same salts mlm_/
    * mlmr_/mlmv_, same hash32, same 80/10/10 split), so the two forms
    * — and the SQL oracle — agree id-for-id; `q_mlm_mask` kept its
    * hash across the swap. Empty-id docs survive via posexplode_outer
    * (one null-position row → empty arrays, n_masked 0), the
    * spanCorrupt `sequence(0,-1)` lesson in explode form.
    *
    * Returns (doc_id, input_ids, labels, n_masked). */
  def mlmMaskExamples(df: org.apache.spark.sql.DataFrame, idsCol: String,
      docIdCol: String, vocabSize: Long, maskPercent: Int = 15)
      : org.apache.spark.sql.DataFrame = {
    require(maskPercent >= 1 && maskPercent <= 99,
      s"maskPercent=$maskPercent out of range")
    val pos = df.repartition(col(docIdCol))
      .select(col(docIdCol).as("doc_id"),
        posexplode_outer(col(idsCol)).as(Seq("i", "t")))
    def h(salt: String) = Sampling.hash32(
      concat(col("doc_id").cast("string"), lit("_"),
        col("i").cast("string")), salt)
    val sel = pmod(h("mlm_"), lit(100L)) < maskPercent
    val sub = pmod(h("mlmr_"), lit(10L))
    val inputId = when(!sel, col("t"))
      .when(sub < 8, lit(vocabSize))
      .when(sub === 8, pmod(h("mlmv_"), lit(vocabSize)))
      .otherwise(col("t"))
    val label = when(sel, col("t")).otherwise(lit(-100L))
    pos
      .select(col("doc_id"), col("i"), inputId.as("input_id"),
        label.as("label"))
      .groupBy("doc_id")
      .agg(
        // the null-position row (empty doc) yields a null struct,
        // which collect_list SKIPS — the doc still emits, with []
        sort_array(collect_list(when(col("i").isNotNull,
          struct(col("i"), col("input_id"), col("label"))))).as("a"),
        sum(when(col("label") =!= lit(-100L), 1L).otherwise(0L))
          .as("nm"))
      .select(col("doc_id"),
        col("a.input_id").as("input_ids"),
        col("a.label").as("labels"),
        coalesce(col("nm"), lit(0L)).as("n_masked"))
  }

  /** Needle-in-a-haystack probes — the long-context retrieval eval's
    * data generator (Kamradt's NIAH protocol): each document's first
    * `ctxWords` words become a haystack with one needle sentence
    * ("the magic number is <v>") inserted at a depth drawn from the
    * eleven fixed rungs 0%, 10%, …, 100%, where the answer <v> is an
    * md5 draw — evaluating a model sweeps accuracy by depth rung and
    * context length. Materialized DETERMINISTICALLY: both draws are
    * [[Sampling.hash32]] under distinct salts, the insert position is
    * exact integer arithmetic ((depth·n) div 100 words precede the
    * needle), so every probe replays in SQL (`q_needle_probes`).
    * Zero-shuffle map-side array arithmetic like the other example
    * synthesizers here ([[spanCorrupt]]/[[fim]]/[[mlmMask]]). */
  def needleProbes(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, ctxWords: Int = 64)
      : org.apache.spark.sql.DataFrame = {
    require(ctxWords >= 1, "ctxWords must be positive")
    val ws = expr(
      s"slice(filter(split(`$textCol`, ' '), t -> t <> ''), 1, $ctxWords)")
    docs.select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 1)
      .withColumn("depth_pct",
        (pmod(Sampling.hash32(col("doc_id"), "ndl_d"), lit(11L)) * 10L)
          .cast("int"))
      .withColumn("answer", pmod(Sampling.hash32(col("doc_id"), "ndl_v"),
        lit(100000L)))
      .withColumn("pos", expr("(depth_pct * size(ws)) div 100"))
      .select(col("doc_id"), col("depth_pct"), col("answer"),
        concat_ws(" ", concat(
          slice(col("ws"), lit(1), col("pos").cast("int")),
          array(lit("the"), lit("magic"), lit("number"), lit("is"),
            col("answer").cast("string")),
          slice(col("ws"), (col("pos") + 1).cast("int"), size(col("ws")))))
          .as("context"))
  }
}
