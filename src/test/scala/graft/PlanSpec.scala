package graft

/** Plan-shape regression tests: pin the structural invariants of the
  * most expensive suite queries — no cartesian products, bounded
  * exchange counts, broadcast on the intended side, pushdown reaching
  * the parquet scan — so a refactor cannot silently reintroduce a
  * scale-killer. Plans are built against the parquet fixture (plans
  * over LocalRelation constant-fold away and assert nothing).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.queries(name)(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  private def exchanges(p: String): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(p).length

  private def assertNoCartesian(p: String, name: String): Unit = {
    assert(!p.contains("CartesianProduct"),
      s"$name plan contains a CartesianProduct")
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"$name has a nested-loop join without a broadcast side")
  }

  test("snapshot scanPruned: the pruned read is a bare filtered scan — " +
      "zero exchanges, range predicate pushed to the kept files") {
    // q_snapshot_prune's own slice is empty at sf0.001 (user_id tops
    // out at 14 here), so build the same shape on this fixture's range
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files
      .createTempDirectory("graft_planspec_prune").toString + "/t"
    val base = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .repartitionByRange(4, col("user_id"))
    graft.core.SnapshotTable.commit(spark, root, base,
      statsCols = Seq("user_id"))
    val (total, kept) = graft.core.SnapshotTable.pruneCounts(
      spark, root, "user_id", 4L, 9L)
    assert(kept < total && kept >= 1, s"kept $kept of $total")
    val p = graft.core.SnapshotTable.scanPruned(spark, root, "user_id", 4L, 9L)
      .filter(col("user_id").between(4, 9))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // manifest pruning happens BEFORE Spark plans; what remains must be
    // scan + filter with the predicate at the parquet reader
    assert(exchanges(p) == 0, s"pruned read must not shuffle:\n$p")
    assert("PushedFilters: \\[[^\\]]*user_id".r.findFirstIn(p).isDefined,
      s"user_id range not pushed to the pruned scan:\n$p")
  }

  test("snapshot DV plan split: a DV-free table reads as a bare scan " +
      "(no join, zero exchanges); a DV'd table anti-joins a BROADCAST " +
      "tombstone side, never a shuffle") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files
      .createTempDirectory("graft_planspec_dv").toString + "/t"
    val base = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
    graft.core.SnapshotTable.commit(spark, root, base)
    def planOf(): String = graft.core.SnapshotTable.read(spark, root)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the pre-DV contract: tables that never used deleteWhereDV keep
    // their exact join-free scan plans
    val clean = planOf()
    assert(!clean.contains("Join") && exchanges(clean) == 0,
      s"DV-free snapshot read must be a bare scan:\n$clean")
    val (_, n, _) = graft.core.SnapshotTable.deleteWhereDV(spark, root,
      col("event_id") % 97 === 0)
    assert(n > 0)
    val dv = planOf()
    assert(dv.contains("BroadcastHashJoin") && dv.contains("LeftAnti"),
      s"DV read must broadcast-anti-join the tombstones:\n$dv")
    assert(!dv.contains("SortMergeJoin"),
      s"tombstone application must never sort-merge:\n$dv")
  }

  test("snapshot scanPrunedBloom: the point-probe read is a bare " +
      "filtered scan — zero exchanges, equality predicate pushed to " +
      "the kept files") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val root = java.nio.file.Files
      .createTempDirectory("graft_planspec_bloom").toString + "/t"
    val base = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .repartition(4, pmod(col("event_id"), lit(4)))
    graft.core.SnapshotTable.commit(spark, root, base,
      bloomCols = Seq("event_id"))
    val probe = base.agg(org.apache.spark.sql.functions
      .min(col("event_id"))).collect()(0).getLong(0)
    val (total, kept) = graft.core.SnapshotTable.pruneCountsBloom(
      spark, root, "event_id", probe.toString)
    assert(kept < total && kept >= 1, s"kept $kept of $total")
    val p = graft.core.SnapshotTable
      .scanPrunedBloom(spark, root, "event_id", probe.toString)
      .filter(col("event_id") === probe)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the manifest bloom resolved the file list BEFORE Spark planned;
    // the equality lands at the parquet reader of the kept files (and
    // parquet's own bloom, written alongside, prunes row groups there)
    assert(exchanges(p) == 0, s"bloom-pruned read must not shuffle:\n$p")
    assert("PushedFilters: \\[[^\\]]*event_id".r.findFirstIn(p).isDefined,
      s"event_id equality not pushed to the pruned scan:\n$p")
  }

  test("q1_pricing_summary: one shuffle (partial+final agg), filter pushed to scan") {
    val p = plan("q1_pricing_summary")
    assertNoCartesian(p, "q1")
    // upper bound, not equality: a harmless planner change (AQE, config)
    // must not fail the suite — only a GROWTH in shuffles is a regression
    assert(exchanges(p) <= 1, s"expected at most 1 exchange:\n$p")
    assert(p.contains("HashAggregate"))
    // the shipdate predicate must reach the parquet scan — match loosely,
    // tolerant of filter ordering/formatting across Spark versions
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      "l_shipdate filter not pushed to the lineitem scan")
  }

  test("q3_top_orders: customer broadcast, top-k via TakeOrderedAndProject") {
    val p = plan("q3_top_orders")
    assertNoCartesian(p, "q3")
    assert(p.contains("BroadcastHashJoin"), "customer side should broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "LIMIT 10 should plan as TakeOrderedAndProject, not a global sort")
  }

  test("q5_region_revenue: three dimension broadcasts, no cartesian") {
    val p = plan("q5_region_revenue")
    assertNoCartesian(p, "q5")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "supplier/nation/region should all broadcast")
  }

  test("q_dedup_ngram_jaccard: PPJoin candidates via equi-join, no cartesian") {
    val p = plan("q_dedup_ngram_jaccard")
    assertNoCartesian(p, "q_dedup_ngram_jaccard")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "prefix candidates must come from an equi-join on shingles")
  }

  test("q_fuzzy_join: cross-relation PPJoin stays equi-join shaped") {
    val p = plan("q_fuzzy_join")
    assertNoCartesian(p, "q_fuzzy_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("q_dedup_minhash_lsh: map-side signature expression + banded equi-join") {
    val p = plan("q_dedup_minhash_lsh")
    assertNoCartesian(p, "q_dedup_minhash_lsh")
    assert(p.contains("minhash_signature"),
      "signature must be the codegen'd map-side expression")
  }

  test("q_ann_bruteforce: queries broadcast against the corpus") {
    val p = plan("q_ann_bruteforce")
    assert(!p.contains("CartesianProduct"),
      "ANN must broadcast the query side, never a cartesian")
    // non-equi (id != query_id) join is nested-loop BY DESIGN — but the
    // small query side must be the broadcast side
    assert(p.contains("BroadcastExchange"),
      "query side should be broadcast")
  }

  test("q_decontaminate_bloom: bloom prefilter sits at the scan side") {
    val p = plan("q_decontaminate_bloom")
    assertNoCartesian(p, "q_decontaminate_bloom")
    assert(p.contains("bloom_hits"),
      "bloom prefilter expression missing from the plan")
  }

  test("q_token_count: scan reads only the projected document columns") {
    val p = plan("q_token_count")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    // the documents table carries many columns; the projection needs few
    assert(readSchemas.forall(s => s.split(",").length <= 4),
      s"scan reads more columns than the projection needs: $readSchemas")
  }

  test("q_curation_pipeline: filters precede the PPJoin, anti-join drops near-dups") {
    val p = plan("q_curation_pipeline")
    assertNoCartesian(p, "q_curation_pipeline")
    assert(p.contains("LeftAnti"), "near-dup drop should be an anti-join")
  }

  test("q_boilerplate_strip: frequency agg feeds an anti-join, no cartesian") {
    val p = plan("q_boilerplate_strip")
    assertNoCartesian(p, "q_boilerplate_strip")
    assert(p.contains("LeftAnti"), "boilerplate drop should be an anti-join")
    assert(p.contains("HashAggregate"), "doc-frequency count should hash-aggregate")
  }

  test("q_decontaminate_embedding: eval side broadcast, anti-join shape") {
    val p = plan("q_decontaminate_embedding")
    assert(p.contains("BroadcastExchange"),
      "benchmark side should broadcast")
    assert(p.contains("LeftAnti") || p.contains("LeftSemi"),
      "decontamination should be an anti/semi join")
  }

  test("q_ann_hamming: packed signatures, queries broadcast, no cartesian") {
    val p = plan("q_ann_hamming")
    assert(!p.contains("CartesianProduct"),
      "Hamming ANN must broadcast the query side, never a cartesian")
    assert(p.contains("BroadcastExchange"), "query side should broadcast")
    assert(p.contains("sign_pack"),
      "packing must be the codegen'd map-side expression")
  }

  test("q_dup_spans: the k-gram explode runs ONCE (window count, no self-join)") {
    val p = plan("q_dup_spans")
    assertNoCartesian(p, "q_dup_spans")
    // tree nodes print as "Generate (n)"; the detail section repeats
    // each as "(n) Generate" — count only the tree occurrences
    val nGenerate = "Generate \\(\\d".r.findAllIn(p).length
    assert(nGenerate == 1,
      s"expected exactly one gram explode in the plan, found $nGenerate — " +
        "a second Generate means the explode subtree is referenced twice")
    assert(p.contains("Window"),
      "per-gram counts should come from a window over the single explode")
  }

  test("q_dsir_importance: scoring is a zero-exchange map pass over the scan") {
    // the bucket-total model is collected as bounded driver state at
    // construction and re-embedded as literals, so the SCORING plan must
    // be scan -> project with no shuffle and no broadcast at all
    val p = plan("q_dsir_importance")
    assertNoCartesian(p, "q_dsir_importance")
    assert(exchanges(p) == 0,
      s"importance scoring must not shuffle — literal weights only:\n$p")
    assert(!p.contains("BroadcastExchange"),
      "model state should be literals, not a broadcast")
  }

  test("q_mixture_sample / q_context_windows: map-side explode, tiny broadcasts only") {
    val pm = plan("q_mixture_sample")
    assertNoCartesian(pm, "q_mixture_sample")
    assert(pm.contains("BroadcastExchange") || pm.contains("BroadcastNestedLoopJoin"),
      "the weight table should broadcast")
    val pc = plan("q_context_windows")
    assertNoCartesian(pc, "q_context_windows")
    assert(pc.contains("Generate"), "window split should be a map-side explode")
  }

  test("q_heavy_hitters_cms: cell agg hash-aggregates, probe join broadcasts") {
    val p = plan("q_heavy_hitters_cms")
    assertNoCartesian(p, "q_heavy_hitters_cms")
    assert(p.contains("HashAggregate"), "cell counting should hash-aggregate")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 exact terms should plan as TakeOrdered, not a global sort")
  }

  test("q_bm25: tf map-side, df/stats broadcast, no cartesian blowup") {
    val p = plan("q_bm25")
    assert(!p.contains("CartesianProduct"),
      "the 1-row stats crossJoin must broadcast, never a cartesian")
    assert(p.contains("BroadcastExchange"), "df/stats tables should broadcast")
    // the round-5 regression this pins: tf, df and dl must all derive
    // from ONE tokenize+explode subtree (df from tf, dl riding through
    // the explode) — a second Generate means the corpus is re-tokenized
    val nGenerate = "Generate \\(\\d".r.findAllIn(p).length
    assert(nGenerate == 1,
      s"expected exactly one tokenize explode in the plan, found $nGenerate")
  }

  test("q_hourly_events / q_stratified_sample: bounded-exchange aggregations") {
    val ph = plan("q_hourly_events")
    assert(exchanges(ph) <= 2, s"q_hourly_events exchange count grew:\n$ph")
    val ps = plan("q_stratified_sample")
    assertNoCartesian(ps, "q_stratified_sample")
  }

  test("q_dsir_resample: selection is TakeOrderedAndProject with zero exchange") {
    val p = plan("q_dsir_resample")
    assertNoCartesian(p, "q_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"),
      "global weighted selection must plan as a bounded per-partition heap")
    assert(exchanges(p) == 0,
      s"DSIR selection should read the scan directly — no exchange:\n$p")
    // the regression this pin exists for: the positivity guard must not
    // re-inline the featurizer into a pushed-down Filter
    assert(!"\\(\\d+\\) Filter".r.findFirstIn(p).isDefined ||
      !"Filter[\\s\\S]{0,4000}?hashed_counts".r.findFirstIn(p).isDefined,
      s"featurizer leaked into a pushed-down filter condition:\n${p.take(2000)}")
  }

  test("q_corpus_delta: one join, md5 payload only, no cartesian") {
    val p = plan("q_corpus_delta")
    assertNoCartesian(p, "q_corpus_delta")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "snapshot diff must be an equi-join")
    // the md5 must be computed BELOW the exchange: no shuffled row may
    // carry the full text column, only (key, 128-bit hash)
    val shuffled = "\\(\\d+\\) Exchange\\s*\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(shuffled.nonEmpty && shuffled.forall(!_.contains("text#")),
      s"full text column travels through the diff exchange: $shuffled")
  }

  test("q_k_anonymize / q_domain_cap / q_token_budget: one shuffle each, no cartesian") {
    for (q <- Seq("q_k_anonymize", "q_domain_cap", "q_token_budget")) {
      val p = plan(q)
      assertNoCartesian(p, q)
      assert(p.contains("Window"), s"$q should be a window pass")
      assert(exchanges(p) <= 1, s"$q exchange count grew:\n$p")
    }
  }

  test("q_curriculum: phase is a sort prefix, never a window partition") {
    val p = plan("q_curriculum")
    assertNoCartesian(p, "q_curriculum")
    assert(!p.contains("Window"),
      "curriculum position must use the range-partitioned rank machinery, " +
        "not a window (a phase-partitioned window would collapse to 3 tasks)")
  }

  test("q_html_extract: map-only over the scan — zero exchange") {
    val p = plan("q_html_extract")
    assert(exchanges(p) == 0,
      s"html extraction must stay a codegen'd map over the scan:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("Filter ("),
      "no UDFs and no residual filter expected")
  }

  test("q_url_normalize: explode + distinct-agg only, bounded exchanges") {
    val p = plan("q_url_normalize")
    assertNoCartesian(p, "q_url_normalize")
    // count(DISTINCT url) per domain plans as two aggregations: one
    // exchange on (domain, url), one on domain — growth past that is a
    // regression (e.g. a window sneaking in)
    assert(exchanges(p) <= 2, s"expected at most 2 exchanges:\n$p")
    assert(!p.contains("Window"), "no window expected in the link rollup")
  }

  test("q_gopher_rules / q_c4_filter / q_unicode_normalize: map-only gates") {
    // the quality/hygiene gates must stay scan-embedded (zero exchange):
    // at 100 TB each of these is one map pass, or it is a regression
    for (q <- Seq("q_gopher_rules", "q_c4_filter", "q_unicode_normalize")) {
      val p = plan(q)
      assert(exchanges(p) == 0, s"$q must be a zero-exchange map pass:\n$p")
      assert(!p.contains("BatchEvalPython"), s"$q must not use Python UDFs")
    }
  }

  test("q_registered_domain / q_web_curation_exact: PSL side broadcasts, no cartesian") {
    for (q <- Seq("q_registered_domain", "q_web_curation_exact")) {
      val p = plan(q)
      assertNoCartesian(p, q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$q: the pinned-snapshot join must broadcast:\n$p")
    }
  }

  test("q_fim: objective materialization is a zero-exchange map") {
    // training runs at plan CONSTRUCTION (bounded driver state); the
    // returned example-materialization plan must be scan -> project
    val p = plan("q_fim")
    assert(exchanges(p) == 0, s"q_fim must fuse into the scan:\n$p")
    assert(!p.contains("BatchEvalPython"), "q_fim must not use Python UDFs")
  }

  test("q_span_corrupt: the explode re-plan keeps exactly ONE shuffle") {
    // the round-11 re-plan (3.22 -> 2.09 s, interpreted HOF draws ->
    // codegen explode): ONE repartition(doc_id) of the raw id rows;
    // the ordinal window AND the example rebuild both reuse that
    // partitioning (doc-keyed) — growth here = the exchange-free
    // window/groupBy property broke
    val p = plan("q_span_corrupt")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("BatchEvalPython"),
      "q_span_corrupt must not use Python UDFs")
  }

  test("q_mlm_mask: the explode re-plan keeps exactly ONE shuffle") {
    // same recipe (5.56 -> 2.59 s): repartition(doc_id), codegen
    // draws, exchange-free rebuild
    val p = plan("q_mlm_mask")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("BatchEvalPython"),
      "q_mlm_mask must not use Python UDFs")
  }

  test("q_zorder_layout: one shuffle for the bucket agg, key is codegen'd") {
    val p = plan("q_zorder_layout")
    // partial agg map-side, one exchange on z_bucket, final agg — the
    // same shape a 100 TB layout-stats pass would want
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("CodegenFallback"),
      "zorder_key must participate in codegen")
  }

  test("q_chrf: gram rows never cross an exchange (pre-partitioned by pair)") {
    val p = plan("q_chrf")
    assertNoCartesian(p, "q_chrf")
    // the measured re-plan (28.9 -> 4.95 s): ONE repartition of the
    // 2-rows-per-pair stack + the small distinct-id branch; the
    // (id,n,g) / (id,n) / (id) aggregations all reuse that
    // partitioning. Growth here = the exchange-free property broke.
    assert(exchanges(p) <= 3, s"expected at most 3 exchanges:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("q_ktruss: no cartesian; the peel joins stay hash/broadcast") {
    val p = plan("q_ktruss")
    assertNoCartesian(p, "q_ktruss")
  }

  test("q_bootstrap_ci: replicate explode reduces before its exchange") {
    val p = plan("q_bootstrap_ci")
    // partial_sum over (b) must appear below the exchange: the xB
    // explode never ships raw rows
    assert(p.contains("HashAggregate"), "expected partial aggregation")
    assert(exchanges(p) <= 3, s"expected at most 3 exchanges:\n$p")
  }

  test("q_crawl_frontier: global cut is TakeOrdered, never a full sort") {
    val p = plan("q_crawl_frontier")
    assertNoCartesian(p, "q_crawl_frontier")
    assert(p.contains("TakeOrderedAndProject"),
      "cycle budget should plan as TakeOrderedAndProject")
  }

  test("stats family: no unpartitioned windows, bounded exchanges, 1-row " +
      "broadcasts only") {
    // mad_outliers runs the ranked median machinery TWICE (value, then
    // |x − med|), hence its higher bound
    for ((q, bound) <- Seq("q_kruskal_wallis" -> 8, "q_benford" -> 8,
        "q_mad_outliers" -> 10, "q_mann_whitney" -> 8, "q_ks_lengths" -> 8,
        "q_cliffs_delta" -> 8, "q_drift_jsd" -> 8, "q_cohens_d" -> 2,
        "q_mutual_information" -> 8, "q_brier_decomposition" -> 4,
        "q_neyman_allocation" -> 4, "q_theil_index" -> 4,
        "q_dp_counts" -> 2, "q_autocorrelation" -> 12,
        "q_trimmed_mean" -> 8, "q_assortativity" -> 10,
        "q_mann_kendall" -> 10, "q_cusum_changepoint" -> 10)) {
      val p = plan(q)
      assertNoCartesian(p, q)
      assert(!p.contains("WindowExec"), // rankedPrefixSums, never a
        s"$q plans a window — the rank machinery broke:\n$p") // global sort window
      assert(exchanges(p) <= bound, s"$q exchange growth:\n$p")
    }
  }

  test("q_kmv_distinct: the k-smallest cut is TakeOrdered, never a " +
      "full sort") {
    val p = plan("q_kmv_distinct")
    assertNoCartesian(p, "q_kmv_distinct")
    assert(p.contains("TakeOrderedAndProject"),
      s"k-smallest must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("WindowExec"), s"q_kmv_distinct window:\n$p")
  }

  test("q_readability: one zero-exchange projection") {
    val p = plan("q_readability")
    assertNoCartesian(p, "q_readability")
    assert(exchanges(p) == 0, s"readability must stay map-side:\n$p")
    assert(!p.contains("WindowExec"), s"q_readability window:\n$p")
  }

  test("q_kendall_tau: grid join is broadcast nested-loop, no window, " +
      "no data-scaled exchange") {
    // the public kendallTau evaluates its one row eagerly (so the cell
    // cache can be unpersisted leak-free), which hides the join from
    // the query's plan — audit the lazy builder behind it instead
    val (cells, out) = graft.operators.Profile.kendallTauPlan(
      graft.core.Tables.documents(spark, dir).select(
        org.apache.spark.sql.functions.expr("n_chars div 64").as("xb"),
        org.apache.spark.sql.functions.expr(
          "size(split(text, ' ')) div 8").cast("long").as("yb")),
      "xb", "yb")
    try {
      val p = out.queryExecution.executedPlan.toString
      // the |G|^2 half-grid join must be BNL over a BROADCAST grid —
      // a CartesianProduct here means the broadcast hint fell off
      assert(p.contains("BroadcastNestedLoopJoin") &&
        p.contains("BroadcastExchange"),
        s"grid self-join should broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"q_kendall_tau cartesian:\n$p")
      assert(!p.contains("WindowExec"), s"q_kendall_tau window:\n$p")
    } finally cells.unpersist(false)
  }

  test("q_unimax_budget: waterfill folds in one k-row array — no window, " +
      "no join, bounded exchanges") {
    val p = plan("q_unimax_budget")
    assertNoCartesian(p, "q_unimax_budget")
    assert(!p.contains("WindowExec"),
      s"the waterfill must fold inside the array, not a global window:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"nothing to join — the plan regressed:\n$p")
    assert(exchanges(p) <= 3, s"q_unimax_budget exchange growth:\n$p")
  }

  test("q_winnow_fingerprints: selection is a ZERO-exchange scan kernel") {
    // the round-12 re-plan: the monotonic-deque expression replaced the
    // frame-min window + gram equi-join (two shuffles of the ~13M-row
    // gram table). Growth above zero = the kernel fell out of the plan.
    val p = plan("q_winnow_fingerprints")
    assertNoCartesian(p, "q_winnow_fingerprints")
    assert(exchanges(p) == 0, s"expected a zero-exchange plan:\n$p")
    assert(p.contains("winnow_fps"), "the native kernel must be in the plan")
  }

  test("q_cdc_dedup: chunking is map-side; only the chunk-hash agg shuffles") {
    val p = plan("q_cdc_dedup")
    assertNoCartesian(p, "q_cdc_dedup")
    assert(p.contains("cdc_chunks"), "the native kernel must be in the plan")
    // chunk generation adds nothing: the exchanges are the md5-keyed
    // aggregate (+ its distinct expand), same as any groupBy report
    assert(exchanges(p) <= 2, s"expected at most 2 exchanges:\n$p")
  }

  test("q_edit_distance_join: gram keying is map-side (no ordinal shuffle)") {
    val p = plan("q_edit_distance_join")
    assertNoCartesian(p, "q_edit_distance_join")
    assert(p.contains("positional_qgram_keys"),
      "the native keying kernel must be in the plan")
    // the remaining exchanges are the ones the algorithm NEEDS: corpus
    // df, the rarity-order rollup, the prefix candidate join, and the
    // two text join-backs — the per-doc ordinal shuffle is gone
    assert(exchanges(p) <= 9, s"exchange growth:\n$p")
  }
}
