package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The end-to-end corpus-curation driver: the single entry point a
  * training-data pipeline calls, composing the library's map-side gates
  * and distributed dedup into ONE lazy plan per stage group (Catalyst
  * fuses the scalar gates into the scan; the expensive set operations
  * stay explicit, orderable and individually skippable).
  *
  * Stage order is the cost-aware one — cheap row-local filters first so
  * every later (shuffling) stage sees a smaller corpus:
  *   1. redact PII (map)
  *   2. quality + repetition gates (map)
  *   3. exact dedup by content fingerprint, min-id survivor (1 shuffle)
  *   4. near-dup drop via MinHash-LSH + exact verify, cluster-canonical
  *      survivor (banded equi-joins)
  *   5. benchmark decontamination (broadcast semi-join)
  *
  * Each stage is a pure DataFrame => DataFrame; `Curation.run` with the
  * default config is the reference composition and every knob has the
  * operator's own default.
  */
object Curation {

  final case class Config(
      redact: Boolean = true,
      minQuality: Double = 0.5,
      maxTopNgramFrac: Double = 0.5,
      maxRepTokenFrac: Double = 0.9,
      exactDedup: Boolean = true,
      nearDupThreshold: Option[Double] = Some(0.8),
      benchmark: Option[DataFrame] = None,
      benchmarkTextCol: String = "text",
      decontaminateNgram: Int = 8,
      /** Some(k) rewrites surviving docs through
        * [[Dedup.passageDedup]] with k-token passages AFTER doc-level
        * dedup — removes cross-document boilerplate doc-level dedup
        * can't see. Docs whose every passage already appeared are
        * dropped entirely. */
      passageDedupTokens: Option[Int] = None,
      /** Some((sourceCol, k, minDocFreq)) strips cross-document
        * boilerplate ([[Dedup.stripBoilerplate]]) FIRST — before the
        * quality gates, because template passages inflate quality and
        * repetition metrics and poison content fingerprints. Docs that
        * were pure template drop out here. */
      boilerplate: Option[(String, Int, Int)] = None,
      /** Some(k) cuts every corpus-duplicated run of ≥ k tokens from
        * surviving docs ([[Dedup.stripDuplicateSpans]] — the Lee et al.
        * ExactSubstr cleaning) as the LAST stage: it sees the deduped
        * corpus, so what remains duplicated is genuine cross-document
        * repetition, not whole-document copies already dropped. Docs
        * that were entirely duplicated text drop out. */
      dupSpanTokens: Option[Int] = None,
      /** Non-empty = drop any doc containing a dictionary phrase (the
        * C4 "bad words" gate), matched case-sensitively against the
        * redacted text by ONE Aho-Corasick pass
        * ([[graft.plans.BlocklistExpressions.blocklist_hits]])
        * regardless of dictionary size. Runs with the stage-1/2 map
        * gates so it fuses into the scan. */
      blocklist: Seq[String] = Nil)

  /** Adaptive quality cutoff: drop the lowest `quantile` fraction of
    * rows by `score` (e.g. 0.1 = drop the bottom decile) — corpus
    * curation's "relative" gate, vs the fixed thresholds in [[run]].
    * The threshold is ONE exact-percentile scalar (a single aggregate,
    * broadcast back), so the filter itself is map-side; the percentile
    * is the exact interpolating one, reproducible across engines. */
  def dropBottomQuantile(df: DataFrame, score: org.apache.spark.sql.Column,
                         quantile: Double): DataFrame = {
    val t = df.select(score.as("__s"))
      .agg(expr(s"percentile(__s, $quantile)").as("__thr"))
    df.join(broadcast(t), score >= col("__thr")).drop("__thr")
  }

  /** Run the full flow over (idCol, textCol) — returns the surviving
    * corpus with a `clean_text` column. */
  def run(docs: DataFrame, idCol: String, textCol: String,
          cfg: Config = Config()): DataFrame = {
    val id = col(idCol)

    // 0: cross-document boilerplate strip — BEFORE the gates (template
    // text inflates quality/repetition metrics and poisons fingerprints)
    val deboiled = cfg.boilerplate match {
      case None => docs
      case Some((sourceCol, k, minDf)) =>
        val stripped = Dedup.stripBoilerplate(docs, idCol, textCol,
          sourceCol, k, minDf).withColumnRenamed("doc_id", idCol)
        docs.drop(textCol)
          .join(stripped.withColumnRenamed("text_clean", textCol), idCol)
    }

    // 1+2: map-side gates — one fused projection+filter over the scan
    val text0 = if (cfg.redact) TextAnalysis.redactPii(col(textCol)) else col(textCol)
    val gated0 = deboiled
      .withColumn("clean_text", text0)
      .withColumn("__rep", TextAnalysis.repetitionStats(col("clean_text")))
      .filter(TextAnalysis.qualityScore(col("clean_text")) >= cfg.minQuality)
      .filter(col("__rep.top_ngram_frac") <= cfg.maxTopNgramFrac &&
        col("__rep.rep_token_frac") <= cfg.maxRepTokenFrac)
      .drop("__rep")
    val gated =
      if (cfg.blocklist.isEmpty) gated0
      else gated0.filter(graft.plans.BlocklistExpressions
        .blocklist_hits(col("clean_text"), cfg.blocklist) === 0)

    // 3: exact dedup — min-id survivor per content fingerprint
    val exact =
      if (!cfg.exactDedup) gated
      else gated
        .groupBy(TextAnalysis.fingerprint(col("clean_text")).as("__fp"))
        .agg(min(id).as(idCol))
        .join(gated, idCol)

    // 4: near-dup drop — every member of a near-dup cluster except its
    // minimum id goes (cluster-level, so transitive chains collapse to
    // ONE survivor, not pairwise coin flips)
    val nearDeduped = cfg.nearDupThreshold match {
      case None => exact
      case Some(t) =>
        val pairs = Dedup.minhashDedup(exact, idCol, "clean_text", threshold = t)
        val drops = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("canonical_id"))
          .select(col("doc_id").as(idCol))
        exact.join(drops, Seq(idCol), "left_anti")
    }

    // 5: decontamination against a held-out benchmark (benchmark frame
    // must carry the same idCol; its text column is configurable)
    val decontaminated = cfg.benchmark match {
      case None => nearDeduped
      case Some(bench) =>
        val b =
          if (cfg.benchmarkTextCol == "clean_text") bench
          else bench.withColumnRenamed(cfg.benchmarkTextCol, "clean_text")
        Decontaminate.clean(nearDeduped, b, idCol, "clean_text",
          n = cfg.decontaminateNgram)
    }

    // 6: passage-level exact dedup — cross-document boilerplate removal
    // at sub-document granularity; replaces clean_text with the
    // reassembled survivor text (docs fully covered elsewhere drop out)
    val passaged = cfg.passageDedupTokens match {
      case None => decontaminated
      case Some(k) =>
        val kept = Dedup.passageDedup(decontaminated, idCol, "clean_text", k)
          .withColumnRenamed("doc_id", idCol)
        decontaminated.drop("clean_text")
          .join(kept.withColumnRenamed("text_dedup", "clean_text"), idCol)
    }

    // 7: exact duplicated-substring cleaning — sliding-gram (vs stage
    // 6's aligned-block) duplicate removal over whatever survived
    val spanned = cfg.dupSpanTokens match {
      case None => passaged
      case Some(k) =>
        val kept = Dedup.stripDuplicateSpans(passaged, idCol, "clean_text", k)
          .withColumnRenamed("doc_id", idCol)
        passaged.drop("clean_text")
          .join(kept.withColumnRenamed("text_clean", "clean_text"), idCol)
    }

    spanned.drop("__fp")
  }

  /** High-entropy token scan — the credential/API-key detector every
    * code-corpus pipeline runs beside the regex PII pass (regexes
    * catch STRUCTURED secrets like cards and emails; a leaked key is
    * just a long random string, and Shannon entropy is the standard
    * detector for it). Tokens of at least `minLen` chars are scored
    * by per-character entropy H = log2(L) − (Σ c·log2 c)/L bits and
    * flagged when H ≥ `minBits`; returns every candidate
    * (id, token, tok_len, entropy, is_secret) so review queues see
    * the near-misses too.
    *
    * Determinism: log2 is not IEEE-correctly-rounded, so every log2
    * is rounded to 9 decimals AT BIRTH and the Σ is a left fold over
    * the token's character counts in CHARACTER order (the
    * naive-Bayes discipline); the final subtraction/division are
    * exact IEEE ops, making the flag comparison engine-exact.
    *
    * Scale shape: the Zipf trick — entropy is computed per DISTINCT
    * candidate token (long random strings are rare; long REPEATED
    * tokens are exactly the compressible, low-entropy case) and
    * joined back to occurrences; char explode, counts and the fold
    * are all token-keyed. */
  def secretScan(docs: DataFrame, idCol: String, textCol: String,
                 minLen: Int = 20, minBits: Double = 3.5): DataFrame = {
    require(minLen >= 2 && minBits > 0, "need minLen >= 2 and minBits > 0")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) >= minLen)
    val distinctToks = toks.select("token").distinct()
    val counts = distinctToks
      .select(col("token"), explode(expr(
        "sequence(1, length(token))")).as("p"))
      .select(col("token"), expr("substring(token, p, 1)").as("ch"))
      .groupBy("token", "ch").agg(count(lit(1)).as("c"))
    val scored = counts
      .withColumn("term", col("c").cast("double") *
        round(log2(col("c").cast("double")), 9))
      .groupBy("token")
      .agg(sum(col("c")).as("tok_len"),
        array_sort(collect_list(struct(col("ch"), col("term")))).as("ts"))
      .withColumn("h",
        round(log2(col("tok_len").cast("double")), 9) -
          expr("aggregate(ts, cast(0 as double), (acc, x) -> acc + x.term)") /
            col("tok_len").cast("double"))
      .select(col("token"), col("tok_len"),
        round(col("h"), 6).as("entropy"),
        (col("h") >= minBits).as("is_secret"))
    toks.join(scored, "token")
      .select(col(idCol), col("token"), col("tok_len"), col("entropy"),
        col("is_secret"))
  }
}
