package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "describe my table" primitive every
  * warehouse engine ships (row/null/distinct counts, min/max per
  * column), used here as the first gate of data-quality monitoring on
  * incoming training-data drops.
  *
  * Scale design: ALL columns profile in a SINGLE aggregation over one
  * scan — partial aggregation is map-side, the shuffle carries one
  * state row per partition. Distinct counts default to
  * `approx_count_distinct` (HLL++, one pass, mergeable sketch);
  * `exact = true` switches to `count(DISTINCT …)`, which Catalyst plans
  * via Expand — the input replicates once per distinct column, so keep
  * exact mode for oracle checks and small tables, approx for the
  * 100 TB path. min/max are cast to string AFTER aggregating (typed
  * comparisons, uniform output schema).
  */
object Profile {

  /** (column_name, n_notnull, n_nulls, n_distinct, min_value, max_value)
    * — one output row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    if (exact) {
      // EXACT mode: one column-pruned pass per column, each a
      // value-keyed pre-aggregate. A single agg carrying k exact
      // countDistinct's would EXPAND every input row k-fold before
      // aggregating (Spark's multi-distinct rewrite) — measured 4.65 s
      // on 4 lineitem columns at sf0.1 vs 1.9 s for this shape; at
      // 100 TB the expand is k extra corpus copies through the first
      // shuffle, while here each pass scans ONE column and shuffles
      // only its distinct values (map-side partial distinct).
      cols.map { c =>
        df.select(col(c).as("v"))
          .groupBy("v").agg(count(lit(1)).as("rows"))
          .agg(
            sum(when(col("v").isNotNull, col("rows")).otherwise(0L))
              .as("n_notnull"),
            sum(when(col("v").isNull, col("rows")).otherwise(0L))
              .as("n_nulls"),
            count(when(col("v").isNotNull, 1)).as("n_distinct"),
            min(col("v")).cast("string").as("min_value"),
            max(col("v")).cast("string").as("max_value"))
          .select(lit(c).as("column_name"),
            // empty-input parity with the count()-based HLL branch:
            // sums over zero groups are NULL, counts are 0
            coalesce(col("n_notnull"), lit(0L)).as("n_notnull"),
            coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_.unionAll(_))
    } else {
      // HLL mode (the 100 TB default): ONE pass over all columns
      val aggs = cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"${c}__cnt"),
          count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
          approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c =>
        s"'$c', `${c}__cnt`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`")
        .mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_notnull, n_nulls, n_distinct, min_value, max_value)"))
    }
  }

  /** Schema drift between two snapshots of "the same" table — the
    * monitoring twin of the reference's add-column evolution (D1):
    * one row per added / removed / retyped column, empty when the
    * schemas agree. Pure metadata (no job runs); returned as a
    * DataFrame so drift reports compose with the rest of a monitoring
    * pipeline (union over tables, sink to the catalog, alert filter). */
  def schemaDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val a = after.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val names = (before.schema.fieldNames ++ after.schema.fieldNames).distinct
    val drift = names.flatMap { n =>
      (b.get(n), a.get(n)) match {
        case (None, Some(t))              => Some((n, "added", null: String, t))
        case (Some(t), None)              => Some((n, "removed", t, null: String))
        case (Some(x), Some(y)) if x != y => Some((n, "retyped", x, y))
        case _                            => None
      }
    }
    val spark = before.sparkSession
    import spark.implicits._
    drift.toSeq.toDF("column_name", "change", "before_type", "after_type")
  }

  /** Out-of-vocabulary profile: build the corpus vocabulary (tokens
    * appearing in ≥ `minDf` distinct documents) and report, per
    * document, total token occurrences, occurrences outside the
    * vocabulary, and the OOV rate — the standard proxy for
    * noise/garbled text and for tokenizer coverage planning.
    *
    * Scale shape: the vocabulary aggregation shuffles (token) with
    * map-side partials; the membership probe is an equi-join that AQE
    * broadcasts when the vocabulary is small (vocabularies grow
    * sub-linearly in corpus size — Heaps' law — so the broadcast only
    * gets relatively cheaper at 100 TB); the per-doc rollup shuffles
    * the doc id. The OOV rate is ONE IEEE division of two exact longs —
    * bit-reproducible across engines. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               minDf: Int = 5): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("tok"), lit(1).as("__v"))
    toks.join(vocab, Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__v").isNull, 1)).as("n_oov"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * snapshot of a score distribution, per group — the standard drift
    * monitor for quality/classifier scores feeding sampling decisions
    * (a silent upstream change shifts the score distribution long
    * before row counts move; PSI > 0.25 is the conventional
    * "investigate" threshold). psi = Σ_b (p_b − q_b)·ln(p_b/q_b) over
    * `bins` fixed monotone score rungs (ceil(score·B) clamped to
    * [1, B] — the calibration binning), with shares floored at
    * `epsilon` so empty buckets keep the index finite.
    *
    * Determinism: bucket counts are exact int64; each share divides
    * once; each bucket term rounds to 9 AT BIRTH and sums by a
    * bin-ordered fold (the calibration ECE discipline); psi rounds to
    * 6. Groups present in only one snapshot are dropped (no
    * distribution to compare against) — count drift is
    * [[profile]]/[[schemaDrift]]'s job.
    *
    * Scale shape: two (group, bucket)-keyed count aggregations with
    * map-side partials, one group-keyed join of the ≤B-row bucket
    * tables, one ≤B-struct fold per group — never a row-level
    * ref × cur join. */
  def distributionDrift(ref: DataFrame, cur: DataFrame, groupCol: String,
                        scoreCol: String, bins: Int = 10,
                        epsilon: Double = 1e-4): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    def bucketed(df: DataFrame): DataFrame = df.select(
      col(groupCol).as("g"),
      greatest(least(ceil(col(scoreCol) * bins).cast("long"),
        lit(bins.toLong)), lit(1L)).as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("n"))
    val r = bucketed(ref)
    val c = bucketed(cur)
    val rt = r.groupBy("g").agg(sum("n").as("n_ref"))
    val ct = c.groupBy("g").agg(sum("n").as("n_cur"))
    r.withColumnRenamed("n", "nr")
      .join(c.withColumnRenamed("n", "nc"), Seq("g", "b"), "full_outer")
      .select(col("g"), col("b"),
        coalesce(col("nr"), lit(0L)).as("nr"),
        coalesce(col("nc"), lit(0L)).as("nc"))
      .join(rt, Seq("g")).join(ct, Seq("g")) // inner: both snapshots only
      .withColumn("p", greatest(col("nr").cast("double") /
        col("n_ref").cast("double"), lit(epsilon)))
      .withColumn("q", greatest(col("nc").cast("double") /
        col("n_cur").cast("double"), lit(epsilon)))
      .withColumn("term", round((col("p") - col("q")) *
        log(col("p") / col("q")), 9))
      .groupBy("g", "n_ref", "n_cur")
      .agg(sort_array(collect_list(struct(col("b"), col("term"))))
        .as("terms"))
      .select(col("g").as(groupCol), col("n_ref"), col("n_cur"),
        round(expr(
          "aggregate(terms, cast(0 as double), (acc, x) -> acc + x.term)"),
          6).as("psi"))
  }

  /** Zipf-law fit over the corpus frequency table — the rank-side
    * power law pairing the Heaps-law vocab curve (q_vocab_coverage):
    * least-squares slope/intercept of ln(freq) on ln(rank) over the
    * top `topR` ranks, the standard corpus-health check (natural
    * text fits slope ≈ −1; template/boilerplate-heavy or synthetic
    * corpora bend visibly). Returns ONE row
    * (n_ranks, slope, intercept).
    *
    * Determinism: ranks come from a TakeOrdered top-R under the
    * total (freq DESC, word ASC) order; each ln is rounded to 9 AT
    * BIRTH and all five regression sums are rank-ordered folds over
    * the ≤ topR collected terms — bounded, config-sized model state
    * (the k-center argument), so the closed-form slope/intercept
    * compose deterministic doubles; round-6 at output. Degenerate
    * inputs (fewer than 2 distinct ranks) report NULL slope rather
    * than dividing by zero.
    *
    * Scale shape: one token-keyed count aggregation (map-side
    * partials) → TakeOrdered(topR) — never a global sort; everything
    * after operates on ≤ topR rows. */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int = 500): DataFrame = {
    require(topR >= 2, "need at least 2 ranks to fit")
    val freqs = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(topR)
    // rank within the bounded top-R set (single-partition window over
    // ≤ topR rows — named bounded state)
    val ranked = freqs.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("f").desc, col("w").asc)).cast("long"))
      .select(
        round(log(col("r").cast("double")), 9).as("x"),
        round(log(col("f").cast("double")), 9).as("y"),
        col("r"))
    val folded = ranked
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("r"), col("x"), col("y"))))
          .as("ts"))
      .select(col("n"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.x)")
          .as("sx"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.y)")
          .as("sy"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.x * t.x)")
          .as("sxx"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.x * t.y)")
          .as("sxy"))
    val nD = col("n").cast("double")
    val den = nD * col("sxx") - col("sx") * col("sx")
    val slope = (nD * col("sxy") - col("sx") * col("sy")) / den
    folded.select(col("n").as("n_ranks"),
      when(den > 0.0, round(slope, 6)).otherwise(lit(null).cast("double"))
        .as("slope"),
      when(den > 0.0,
        round((col("sy") - slope * col("sx")) / nD, 6))
        .otherwise(lit(null).cast("double")).as("intercept"))
  }

  /** Heaps'-law fit V(N) = k·N^β — the vocabulary-GROWTH power law
    * pairing [[zipfFit]]'s rank-frequency law (the two are the twin
    * empirical laws every corpus report quotes; β ≈ 0.4-0.6 for
    * natural text, and the fitted curve is what sizes a tokenizer's
    * vocab budget as the corpus grows): the corpus is cut into
    * `rungs` doc-id prefixes, each contributing one (ln N_r, ln V_r)
    * point — N_r = tokens in the prefix, V_r = distinct words FIRST
    * seen in it (cumulative) — and the least-squares line over the
    * rung-ordered points gives (beta = slope, ln_k = intercept).
    * Returns ONE row (n_points, beta, ln_k).
    *
    * Determinism: V_r comes from per-word min(doc_id) bucketed to its
    * first containing rung — pure integer arithmetic
    * (((id+1)·rungs + n − 1) div n); each ln rounds to 9 AT BIRTH and
    * the regression sums are rung-ordered folds (the zipfFit
    * discipline). Prefixes with zero tokens or zero vocab are
    * EXCLUDED from the fit (ln undefined — loud, not −inf).
    *
    * Scale shape: ONE token pass for the (word → first id) aggregate
    * (map-side partial min), one doc-level token-count pass; both
    * reduce to ≤ rungs rows, and the cumulative is a rungs²-row
    * broadcast self-join — bounded model state, never a window over
    * corpus rows. Doc ids are assumed to BE the corpus order (the
    * fixture's contiguous 0..n−1); for arbitrary ids rank first. */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
               rungs: Int = 10): DataFrame = {
    require(rungs >= 2, "need at least 2 prefix rungs")
    val n = docs.agg(count(lit(1)).as("nd"))
    val ws = expr(s"filter(split(`$textCol`, ' '), t -> t <> '')")
    val firsts = docs
      .select(col(idCol).cast("long").as("id"), explode(ws).as("w"))
      .groupBy("w").agg(min(col("id")).as("f"))
      .crossJoin(broadcast(n))
      .select(expr(s"((f + 1) * $rungs + nd - 1) div nd").as("r"))
      .groupBy("r").agg(count(lit(1)).as("v_new"))
    val docTok = docs
      .select(col(idCol).cast("long").as("id"), size(ws).cast("long").as("nt"))
      .crossJoin(broadcast(n))
      .select(expr(s"((id + 1) * $rungs + nd - 1) div nd").as("r"), col("nt"))
      .groupBy("r").agg(sum(col("nt")).as("t_new"))
    val byRung = firsts.join(docTok, Seq("r"), "full_outer")
      .select(col("r"), coalesce(col("v_new"), lit(0L)).as("v_new"),
        coalesce(col("t_new"), lit(0L)).as("t_new"))
    val cum = byRung.as("a")
      .join(broadcast(byRung.as("b")), col("b.r") <= col("a.r"))
      .groupBy(col("a.r").as("r"))
      .agg(sum(col("b.v_new")).as("v"), sum(col("b.t_new")).as("t"))
    val pts = cum.filter(col("v") > 0 && col("t") > 0)
      .select(col("r"),
        round(log(col("t").cast("double")), 9).as("x"),
        round(log(col("v").cast("double")), 9).as("y"))
    val folded = pts
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("r"), col("x"), col("y"))))
          .as("ts"))
      .select(col("n"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.x)")
          .as("sx"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.y)")
          .as("sy"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.x * t.x)")
          .as("sxx"),
        expr("aggregate(ts, cast(0 as double), (acc, t) -> acc + t.x * t.y)")
          .as("sxy"))
    val nD = col("n").cast("double")
    val den = nD * col("sxx") - col("sx") * col("sx")
    val slope = (nD * col("sxy") - col("sx") * col("sy")) / den
    folded.select(col("n").as("n_points"),
      when(den > 0.0, round(slope, 6)).otherwise(lit(null).cast("double"))
        .as("beta"),
      when(den > 0.0, round((col("sy") - slope * col("sx")) / nD, 6))
        .otherwise(lit(null).cast("double")).as("ln_k"))
  }

  /** One-pass lexical-diversity panel: token count N, vocabulary V,
    * type-token ratio V/N, Simpson's repeat-rate Σc(c−1)/(N(N−1)),
    * the bias-corrected Chao1 richness estimate V + f1(f1−1)/(2(f2+1))
    * (how much vocabulary the corpus has NOT yet seen — the number a
    * vocab budget extrapolates with, complementing [[heapsFit]]'s
    * growth curve), and the Good-Turing unseen-mass estimate f1/N.
    * ONE row out.
    *
    * All numerators exact (c(c−1) summed in decimal(38,0) — Σ is
    * bounded by N², past int64 at ~3e9 tokens; f1/f2/V plain counts);
    * each ratio is ONE double division, round-6. N < 2 pins
    * simpson/gt to 0 rather than 0/0.
    *
    * Scale: one token pass → word-keyed count agg (map-side partials)
    * → a 1-row reduce. */
  def lexicalDiversity(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(expr(
        s"filter(split(`$textCol`, ' '), t -> t <> '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    counts.agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
      sum((col("c") * (col("c") - 1)).cast("decimal(38,0)")).as("rep"))
      .select(
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("vocab"),
        when(col("n_tokens") > 0, round(col("vocab").cast("double") /
          col("n_tokens").cast("double"), 6)).as("ttr"),
        when(col("n_tokens") >= 2, round(col("rep").cast("double") /
          (col("n_tokens").cast("decimal(38,0)") * (col("n_tokens") - 1))
            .cast("double"), 6)).otherwise(lit(0.0)).as("simpson"),
        round(col("vocab") + col("f1").cast("double") * (col("f1") - 1) /
          (lit(2.0) * (col("f2") + 1).cast("double")), 6).as("chao1"),
        when(col("n_tokens") > 0, round(col("f1").cast("double") /
          col("n_tokens").cast("double"), 6)).otherwise(lit(0.0))
          .as("gt_unseen"))
  }

  /** Word dispersion DP (Gries 2008, "Dispersions and adjusted
    * frequencies") over a corpus partitioned by `sourceCol`:
    * DP(w) = ½·Σ_s |v_ws/c_w − t_s/T| — 0 when the word is spread
    * exactly like the corpus mass, → 1 when it is a one-source burst.
    * Frequency alone can't see this (a boilerplate token and a core
    * vocabulary word may count the same); DP is the standard
    * burstiness complement, and a high-frequency high-DP word is the
    * classic template-contamination signal. Reports the `topK` most
    * frequent words under the (count DESC, word ASC) total order.
    *
    * Exact arithmetic: each summand is the exact int64 cross-product
    * |v_ws·T − t_s·c_w| over the common denominator c_w·T, summed in
    * decimal(38,0) (v·T reaches c_w·T ≈ T² — past int64 at ~3e9
    * tokens), with ONE double division (2·c_w·T) at the end.
    *
    * Scale shape: one (word, source) count aggregation; the per-source
    * totals are a |sources|-row broadcast; the dense word×source grid
    * exists only for the topK words (TakeOrdered — never a global
    * sort), so the absent-source zero terms cost topK·|sources| rows. */
  def wordDispersion(docs: DataFrame, textCol: String, sourceCol: String,
                     topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val toks = docs.select(col(sourceCol).as("src"),
      explode(expr(s"filter(split(`$textCol`, ' '), t -> t <> '')")).as("w"))
    val cws = toks.groupBy("w", "src").agg(count(lit(1)).as("v"))
    val srcTot = toks.groupBy("src").agg(count(lit(1)).as("t_s"))
    val tot = toks.agg(count(lit(1)).as("tt"))
    val top = cws.groupBy("w").agg(sum(col("v")).as("c_w"))
      .orderBy(col("c_w").desc, col("w").asc).limit(topK)
    val grid = top.crossJoin(broadcast(srcTot))
      .join(cws, Seq("w", "src"), "left")
      .crossJoin(broadcast(tot))
      .select(col("w"), col("c_w"),
        abs(coalesce(col("v"), lit(0L)).cast("decimal(19,0)") * col("tt") -
          col("t_s").cast("decimal(19,0)") * col("c_w")).as("term"),
        col("tt"))
    grid.groupBy("w", "c_w", "tt")
      .agg(sum(col("term")).as("num"))
      .select(col("w"), col("c_w"),
        round(col("num").cast("double") /
          (lit(2).cast("decimal(19,0)") * col("c_w") * col("tt"))
            .cast("double"), 6).as("dp"))
  }

  /** Gini concentration index of a non-negative int64 measure (token
    * counts, byte sizes, per-domain shares — the standard corpus-
    * inequality number next to [[zipfFit]]'s power law): for values
    * x_(1) ≤ … ≤ x_(n) under the total (x, id) order,
    * G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx). ONE row out:
    * (n, total, gini).
    *
    * Exact-integer discipline: ranks come from
    * [[Sampling.rankedPrefixSums]] (range exchange — no global-sort
    * window at any n), every sum is decimal(38,0) (i·x products reach
    * n·max_x, far past int64 at corpus scale — the q_outliers
    * HUGEINT/decimal pairing), and ONE final double division makes
    * the index. All-zero totals report NULL, never 0/0; any negative
    * value makes the whole index NULL (loud — Gini is undefined
    * there — rather than a silently wrong number). */
  def giniIndex(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val ranked = Sampling.rankedPrefixSums(base,
      Seq(col("x"), col("id")), col("x"), "r", "cum")
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(when(col("x") < 0, 1L).otherwise(0L)).as("n_neg"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("r").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .as("six"))
    agg.select(col("n"), col("sx").cast("long").as("total"),
      when(col("n_neg") > 0, lit(null).cast("double"))
        .when(col("sx") > 0, round(
          (lit(2).cast("decimal(38,0)") * col("six") -
            (col("n") + 1).cast("decimal(38,0)") * col("sx")).cast("double") /
            (col("n").cast("decimal(38,0)") * col("sx")).cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("gini"))
  }

  /** Rank correlation between two int64 measures under the
    * (value, id) TOTAL order — Spearman's ρ with ties broken by id
    * rather than midranks (named deviation: midranks need a second
    * per-value aggregate; the total order keeps every rank an exact
    * distinct integer and the whole statistic engine-exact, and for
    * continuous-ish measures the two agree to noise). ρ = 1 −
    * 6·Σd² / (n·(n²−1)), d = rank_x − rank_y. ONE row out:
    * (n, sum_d2, rho).
    *
    * Ranks from two [[Sampling.rankedPrefixSums]] range exchanges
    * joined back on id; Σd² in decimal(38,0) (≤ n³ — int64 dies at
    * ~2M rows, the named bound decimals lift); one double division,
    * round 6; n < 2 reports NULL. */
  def rankCorrelation(df: DataFrame, xCol: String, yCol: String,
                      idCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      col(xCol).cast("long").as("xv"), col(yCol).cast("long").as("yv"))
      .filter(col("xv").isNotNull && col("yv").isNotNull)
    val rx = Sampling.rankedPrefixSums(base, Seq(col("xv"), col("id")),
      lit(0L), "rx", "__cx").select(col("id"), col("rx"))
    val ry = Sampling.rankedPrefixSums(base, Seq(col("yv"), col("id")),
      lit(0L), "ry", "__cy").select(col("id"), col("ry"))
    val d = rx.join(ry, "id")
      .select(((col("rx") - col("ry")).cast("decimal(19,0)") *
        (col("rx") - col("ry")).cast("decimal(19,0)")).as("d2"))
    d.agg(count(lit(1)).as("n"), sum(col("d2")).as("sd2"))
      .select(col("n"), col("sd2").cast("long").as("sum_d2"),
        when(col("n") >= 2, round(lit(1.0) -
          (lit(6).cast("decimal(38,0)") * col("sd2")).cast("double") /
            (col("n").cast("decimal(38,0)") *
              (col("n").cast("decimal(38,0)") * col("n") - 1)).cast("double"),
          6)).otherwise(lit(null).cast("double")).as("rho"))
  }

  /** Loud guard for the c·2³¹ prefix-sum packing ([[mannWhitney]] /
    * [[ksTest]]): returns `tot` unchanged while it is NULL (empty
    * input — the downstream aggregate already reports NULLs) or below
    * `bound`; past the bound it raises instead of letting the packed
    * running sum wrap silently into a wrong-but-plausible statistic —
    * the [[Sampling.strictLongId]] precedent applied to a numeric
    * bound. Package-visible so the spec can forge an overflow with a
    * tiny bound. */
  private[graft] def assertPackBound(tot: Column, bound: Long,
      ctx: String): Column =
    when(tot.isNull || tot < bound, tot)
      .otherwise(raise_error(concat(
        lit(s"$ctx: total count "), tot.cast("string"),
        lit(s" >= $bound — the c*2^31 prefix-sum packing would wrap; " +
          "shard the input or widen the pack before trusting this " +
          "statistic"))))

  /** The c·2³¹ prefix-sum packing modulus shared by [[mannWhitney]] /
    * [[cliffsDelta]] / [[ksTest]] — exact while the packed count stays
    * below it, [[assertPackBound]]-guarded everywhere it is used. */
  private val PackM = 1L << 31

  /** Shared two-sample doubled-midrank aggregate behind [[mannWhitney]]
    * and [[cliffsDelta]] — ONE row out: (na, nb, nn, r2a = 2·R_a in
    * decimal(38,0), tsum = Σ(t³−t) in decimal(38,0), tot_n). Both
    * per-sample cumulative counts ride ONE
    * [[Sampling.rankedPrefixSums]] pass via the c·2³¹ packing; callers
    * apply [[assertPackBound]] on tot_n before trusting the split. */
  private def twoSampleRankAgg(df: DataFrame, valueCol: String,
      inA: org.apache.spark.sql.Column): DataFrame = {
    val m = PackM
    val counts = df.select(col(valueCol).cast("long").as("v"),
      when(inA, 1L).otherwise(0L).as("a"))
      .filter(col("v").isNotNull)
      .groupBy("v")
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = Sampling.rankedPrefixSums(counts, Seq(col("v")),
      col("ca") * m + col("c"), "__r", "packed")
      .select(col("ca"), col("cb"), col("c"),
        expr(s"packed div ${m}L").as("cum_a"),
        pmod(col("packed"), lit(m)).as("cum_all"))
    cum.agg(
      max(col("cum_a")).as("na"),
      (max(col("cum_all")) - max(col("cum_a"))).as("nb"),
      max(col("cum_all")).as("nn"),
      // Σ ca·(2·cum_all − c + 1) = 2·R_a with midranks, exact
      sum((col("ca") * (lit(2L) * col("cum_all") - col("c") + 1L))
        .cast("decimal(38,0)")).as("r2a"),
      // tie term t³−t: the CUBE must be decimal too — an int64 c*c*c
      // wraps silently (non-ANSI) once a single tie group passes ~2.1M
      // values, which a 100 TB corpus with an int measure will hit
      sum(col("c").cast("decimal(38,0)") * col("c") * col("c") - col("c"))
        .as("tsum"),
      sum(col("c")).as("tot_n"))
  }

  /** Two-sample Mann-Whitney U (Wilcoxon rank-sum) over an int64
    * measure — the rank-based LOCATION-shift test beside [[ksTest]]'s
    * any-difference statistic: U_a = R_a − n_a(n_a+1)/2 with midranks
    * for ties, z = (U_a − n_a·n_b/2) / σ under the tie-corrected
    * normal approximation σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))).
    * ONE row out: (n_a, n_b, u2_a = 2·U_a, z, reject_05).
    *
    * Determinism: midranks are half-integers, so the rank sum is kept
    * DOUBLED (2·midrank = 2·cum − c + 1, exact int64; decimal(38,0)
    * for the sums — R₂ reaches N², the q_outliers pairing). z and the
    * 1.959964 flag are IEEE doubles composed from those exact
    * integers in ONE fixed expression order — +, ·, /, and sqrt are
    * all correctly-rounded IEEE ops, so both engines produce the
    * bit-identical double. σ² = 0 (all values tied) reports NULL z,
    * never 0/0.
    *
    * Scale shape: same as [[ksTest]] — one value-keyed count
    * aggregate, both per-sample counts and the cumulative total in
    * ONE [[Sampling.rankedPrefixSums]] pass (packed fold), a 1-row
    * reduce. The c·2³¹ packing is exact only while the TOTAL count
    * stays below 2³¹ — [[assertPackBound]] raises loudly past it
    * instead of letting the decomposition wrap silently. */
  def mannWhitney(df: DataFrame, valueCol: String,
                  inA: org.apache.spark.sql.Column): DataFrame = {
    val agg = twoSampleRankAgg(df, valueCol, inA)
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val nD = col("nn").cast("double")
    val u2 = col("r2a") - (col("na").cast("decimal(38,0)") *
      (col("na") + 1))
    val zNum = u2.cast("double") / lit(2.0) - naD * nbD / lit(2.0)
    val sigma2 = naD * nbD / lit(12.0) *
      ((nD + 1.0) - col("tsum").cast("double") / (nD * (nD - 1.0)))
    val z = zNum / sqrt(sigma2)
    agg.select(
      when(assertPackBound(col("tot_n"), PackM, "mannWhitney").isNotNull,
        col("na")).as("n_a"),
      col("nb").as("n_b"),
      u2.cast("long").as("u2_a"),
      when(col("na") > 0 && col("nb") > 0 && sigma2 > 0.0,
        round(z, 6)).otherwise(lit(null).cast("double")).as("z"),
      when(col("na") > 0 && col("nb") > 0 && sigma2 > 0.0,
        abs(z) > 1.959964).otherwise(lit(null).cast("boolean"))
        .as("reject_05"))
  }

  /** Cliff's delta ordinal effect size over an int64 measure — the
    * SIZE companion to [[mannWhitney]]'s significance flag (a 100 TB
    * corpus makes every shift "significant"; δ says whether it
    * matters): δ = (#{a>b} − #{a<b}) / (n_a·n_b), which the doubled-U
    * identity collapses to (u2_a − n_a·n_b)/(n_a·n_b) — ties contribute
    * ½ to U on each side and cancel exactly in the difference, so the
    * SAME [[twoSampleRankAgg]] one-pass aggregate carries both
    * statistics. Magnitude labels at the published |δ| thresholds
    * 0.147 / 0.33 / 0.474 (Romano et al. 2006 — pinned constants, the
    * 1.959964 class), applied to the ROUNDED δ so both engines label
    * identically. ONE row out: (n_a, n_b, delta, magnitude).
    *
    * Determinism: u2_a and n_a·n_b are exact decimal(38,0); δ is one
    * IEEE division of their exact difference, round 6. Either sample
    * empty reports NULL δ and magnitude. Same [[assertPackBound]]
    * guard as [[mannWhitney]] (the c·2³¹ packing). */
  def cliffsDelta(df: DataFrame, valueCol: String,
                  inA: org.apache.spark.sql.Column): DataFrame = {
    val agg = twoSampleRankAgg(df, valueCol, inA)
    val u2 = col("r2a") - (col("na").cast("decimal(38,0)") *
      (col("na") + 1))
    val nab = col("na").cast("decimal(38,0)") * col("nb")
    val delta = round((u2 - nab).cast("double") / nab.cast("double"), 6)
    val absd = abs(delta)
    agg.select(
      when(assertPackBound(col("tot_n"), PackM, "cliffsDelta").isNotNull,
        col("na")).as("n_a"),
      col("nb").as("n_b"),
      when(col("na") > 0 && col("nb") > 0, delta)
        .otherwise(lit(null).cast("double")).as("delta"),
      when(col("na") > 0 && col("nb") > 0,
        when(absd < 0.147, "negligible").when(absd < 0.33, "small")
          .when(absd < 0.474, "medium").otherwise("large"))
        .otherwise(lit(null).cast("string")).as("magnitude"))
  }

  /** Cohen's d standardized mean difference over an int64 measure —
    * the PARAMETRIC effect size beside [[cliffsDelta]]'s ordinal one
    * (read together: d assumes roughly-normal spreads, δ only ranks;
    * when they disagree the distribution shape is the story):
    * d = (mean_a − mean_b) / s_pooled with the pooled variance
    * s² = [(Σv²_a − S_a²/n_a) + (Σv²_b − S_b²/n_b)] / (n_a + n_b − 2),
    * plus Hedges' g = d·(1 − 3/(4(n_a+n_b) − 9)) — the small-sample
    * bias correction (closed form, no tabulated data). ONE row out:
    * (n_a, n_b, mean_a, mean_b, d, g).
    *
    * Determinism: Σv and Σv² accumulate as exact decimal(38,0); every
    * double composes from those exact integers in ONE fixed IEEE
    * order, round 6. NAMED BOUND: the decimal→double casts are exact
    * only below 2⁵³ — Σv² passes that at ~10¹⁶ (e.g. 10⁸ rows of
    * 4-digit values), past which the last bits of d wobble (never
    * wrong-by-magnitude; the bound is the cast, not the sum).
    * n_a < 2, n_b < 2, or zero pooled variance report NULL d/g. */
  def cohensD(df: DataFrame, valueCol: String,
              inA: org.apache.spark.sql.Column): DataFrame = {
    val agg = df.select(col(valueCol).cast("long").as("v"),
        when(inA, 1L).otherwise(0L).as("a"))
      .filter(col("v").isNotNull)
      .agg(
        sum(col("a")).as("na"), sum(lit(1L) - col("a")).as("nb"),
        sum(when(col("a") === 1L, col("v").cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("sa"),
        sum(when(col("a") === 0L, col("v").cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("sb"),
        sum(when(col("a") === 1L,
          col("v").cast("decimal(38,0)") * col("v"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("qa"),
        sum(when(col("a") === 0L,
          col("v").cast("decimal(38,0)") * col("v"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("qb"))
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val ma = col("sa").cast("double") / naD
    val mb = col("sb").cast("double") / nbD
    val ssA = col("qa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double") / naD
    val ssB = col("qb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double") / nbD
    val sp2 = (ssA + ssB) / (naD + nbD - 2.0)
    val d = (ma - mb) / sqrt(sp2)
    val g = d * (lit(1.0) - lit(3.0) / (lit(4.0) * (naD + nbD) - 9.0))
    val ok = col("na") >= 2 && col("nb") >= 2 && sp2 > 0.0
    agg.select(
      col("na").as("n_a"), col("nb").as("n_b"),
      when(col("na") > 0, round(ma, 6))
        .otherwise(lit(null).cast("double")).as("mean_a"),
      when(col("nb") > 0, round(mb, 6))
        .otherwise(lit(null).cast("double")).as("mean_b"),
      when(ok, round(d, 6)).otherwise(lit(null).cast("double")).as("d"),
      when(ok, round(g, 6)).otherwise(lit(null).cast("double")).as("g"))
  }

  /** Mutual information between two CATEGORICAL columns — the
    * metadata-audit statistic ("does source predict lang?" — high MI
    * between dimensions a sampler treats as independent is a mixture
    * bug, and between a split key and any feature it is leakage):
    * MI = Σ_cells (c/n)·log2(c·n/(c_x·c_y)) in bits, with the
    * marginal entropies H = −Σ (t/n)·log2(t/n) and
    * NMI = MI/sqrt(H_x·H_y). ONE row out:
    * (n, n_cells, mi, h_x, h_y, nmi).
    *
    * Determinism: all counts exact int64; each cell/marginal term
    * rounds to 9 AT BIRTH and sums by a key-ordered bounded fold (the
    * PSI/ECE discipline — log2 is not IEEE-guaranteed identical
    * across engines, the birth-round absorbs the ulp); mi/h/nmi round
    * 6. NMI reports NULL when either marginal entropy is 0 (a
    * constant column carries no information to normalize by).
    *
    * Scale shape: one (x, y)-keyed count aggregate with map-side
    * partials; cells and marginals are CONFIG-BOUNDED (categorical
    * dims — the named bound), folded as ≤|G|-struct lists, a 1-row
    * result. Rows never shuffle, only (cell, count) pairs. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val cells = df.select(col(xCol).cast("string").as("x"),
      col(yCol).cast("string").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    // ONE (x, y) shuffle, then the whole statistic — marginals, both
    // entropies, every cell term — inside a single collected
    // config-bounded grid array (the unimaxBudget fold shape): the
    // scan runs once, O(|G|²) marginal re-sums are a bucket-design
    // constant, and the fold orders are pinned by the sorted array
    val grid = cells.agg(
      sort_array(collect_list(struct(col("x"), col("y"), col("c"))))
        .as("cs"),
      sum(col("c")).as("n"), count(lit(1)).as("n_cells"))
    def marginalEntropy(key: String): String =
      s"""aggregate(transform(
         |    sort_array(array_distinct(transform(cs, e -> e.$key))),
         |    k -> round(-1.0
         |      * (cast(aggregate(filter(cs, u -> u.$key = k), 0L,
         |           (a, u) -> a + u.c) as double) / cast(n as double))
         |      * log2(cast(aggregate(filter(cs, u -> u.$key = k), 0L,
         |           (a, u) -> a + u.c) as double) / cast(n as double)), 9)),
         |  cast(0 as double), (acc, t) -> acc + t)""".stripMargin
    grid.select(col("n"), col("n_cells"),
        expr(
          """aggregate(transform(cs, e -> round(
            |    (cast(e.c as double) / cast(n as double))
            |    * log2(cast(e.c as double) * cast(n as double)
            |        / (cast(aggregate(filter(cs, u -> u.x = e.x), 0L,
            |             (a, u) -> a + u.c) as double)
            |         * cast(aggregate(filter(cs, u -> u.y = e.y), 0L,
            |             (a, u) -> a + u.c) as double))), 9)),
            |  cast(0 as double), (acc, t) -> acc + t)""".stripMargin)
          .as("mi_raw"),
        expr(marginalEntropy("x")).as("hx_raw"),
        expr(marginalEntropy("y")).as("hy_raw"))
      .select(col("n"), col("n_cells"),
        round(col("mi_raw"), 6).as("mi"),
        round(col("hx_raw"), 6).as("h_x"),
        round(col("hy_raw"), 6).as("h_y"),
        when(col("hx_raw") > 0.0 && col("hy_raw") > 0.0,
          round(col("mi_raw") / sqrt(col("hx_raw") * col("hy_raw")), 6))
          .otherwise(lit(null).cast("double")).as("nmi"))
  }

  /** Kendall's τ-b rank correlation between two int64 measures, EXACT
    * on the (x, y) value grid: concordant/discordant pair counts from
    * one grid self-join restricted to x' > x (each unordered pair
    * counted once; multiplicities ride as c_i·c_j products, so ROW
    * count never enters the join), tie terms from the marginals,
    * τ_b = 2·(P − Q) / sqrt((n² − Σt_x²)·(n² − Σt_y²)) — the doubled
    * form keeps every operand an exact integer (2(n0−n1) = n² − Σt_x²
    * since Σt_x = n).
    *
    * Scale shape — THE NAMED BOUND, now GUARDED: the join is grid ×
    * grid, |G|²/2 pairs with |G| = count of distinct (x, y) CELLS, so
    * callers must bucket continuous measures first (q_kendall_tau
    * walks in with ~30 cells); the right side broadcasts explicitly —
    * grid size is a bucket-design constant, never data-scaled. An
    * unbucketed high-cardinality measure (ids, timestamps) would turn
    * the broadcast + self-join into a driver-killing quadratic plan,
    * so the grid is counted FIRST and anything over
    * [[kendallTauMaxCells]] raises with the bucketing hint instead
    * (the assertPackBound / strictLongId discipline). The count
    * materializes the cell table once — it is cached for reuse across
    * the statistic's aggregations and UNPERSISTED before return (the
    * one-row result is evaluated eagerly inside this call, so no
    * returned plan depends on the cache). Beside
    * [[rankCorrelation]]'s Spearman (which is exact per ROW but
    * tie-broken by id), τ-b is the midrank-honest statistic — the grid
    * is what makes exact tie handling affordable.
    *
    * Determinism: P, Q, Σt², n all exact decimal(38,0)/int64; τ_b is
    * one fixed IEEE expression over them, round 6. A degenerate
    * denominator (all x tied or all y tied) reports NULL. ONE row out:
    * (n, n_cells, concordant, discordant, tau_b). */
  /** Hard ceiling on kendallTau's (x, y) cell grid: 10⁵ cells is
    * ~5·10⁹ grid-pair products — already the outer edge of a sane
    * single broadcast join, and far above any designed bucketing. */
  val kendallTauMaxCells: Long = 100000L

  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val (cells, out) = kendallTauPlan(df, xCol, yCol)
    // ONE row out: evaluate eagerly so the cached cell grid can be
    // unpersisted HERE on the success path too (it used to survive the
    // call — a cached-RDD leak per invocation in long-running
    // services); the caller still gets a DataFrame, just one with no
    // live dependency on the cache
    val rows = out.collect()
    cells.unpersist(false)
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** The lazy (cells, result) pair behind [[kendallTau]], exposed so
    * the plan audit can pin the broadcast-BNL grid-join shape that the
    * public API's eager evaluation hides. Callers OWN the returned
    * `cells` cache — unpersist it after consuming the result. */
  private[graft] def kendallTauPlan(df: DataFrame, xCol: String,
                                    yCol: String): (DataFrame, DataFrame) = {
    val cells = df.select(col(xCol).cast("long").as("xv"),
      col(yCol).cast("long").as("yv"))
      .filter(col("xv").isNotNull && col("yv").isNotNull)
      .groupBy("xv", "yv").agg(count(lit(1)).as("c"))
      .persist()
    val nCells = cells.count()
    if (nCells > kendallTauMaxCells) {
      cells.unpersist()
      throw new IllegalArgumentException(
        s"kendallTau: $nCells distinct (x, y) cells exceeds the " +
          s"$kendallTauMaxCells-cell grid ceiling — the pair join is " +
          "|G|²/2 on the CELL grid, so bucket continuous or " +
          "high-cardinality measures first (note both measures are " +
          "cast('long'): a double measure is silently truncated toward " +
          "zero before gridding, so bucket in the units you mean)")
    }
    val tot = cells.agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_cells"))
    val tx = cells.groupBy("xv").agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast("decimal(38,0)") * col("t")).as("stx2"))
    val ty = cells.groupBy("yv").agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast("decimal(38,0)") * col("t")).as("sty2"))
    val b = broadcast(cells.select(col("xv").as("bx"),
      col("yv").as("by"), col("c").as("bc")))
    val pq = cells.join(b, col("bx") > col("xv"))
      .agg(
        coalesce(sum(when(col("by") > col("yv"),
          col("c").cast("decimal(38,0)") * col("bc"))),
          lit(0).cast("decimal(38,0)")).as("p"),
        coalesce(sum(when(col("by") < col("yv"),
          col("c").cast("decimal(38,0)") * col("bc"))),
          lit(0).cast("decimal(38,0)")).as("q"))
    val n2 = col("n").cast("decimal(38,0)") * col("n")
    val d1 = (n2 - col("stx2")).cast("double")
    val d2 = (n2 - col("sty2")).cast("double")
    val tau = round(lit(2.0) * (col("p") - col("q")).cast("double") /
      sqrt(d1 * d2), 6)
    val out = tot.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(pq))
      .select(col("n"), col("n_cells"),
        col("p").cast("long").as("concordant"),
        col("q").cast("long").as("discordant"),
        when(d1 > 0.0 && d2 > 0.0, tau)
          .otherwise(lit(null).cast("double")).as("tau_b"))
    (cells, out)
  }

  /** Jensen-Shannon divergence between a REFERENCE and a CURRENT
    * score distribution, per group — [[distributionDrift]]'s BOUNDED
    * companion (PSI is unbounded and needs an epsilon floor on empty
    * buckets; JSD is finite by construction — a bucket empty on one
    * side contributes p/2·log2 2 = p/2 — and lands in [0, 1] with
    * log2, so one alerting threshold works across metrics of any
    * cardinality). Same fixed monotone binning, jsd =
    * Σ_b [p·log2(2p/(p+q))/2 + q·log2(2q/(p+q))/2] with 0·log ≡ 0.
    *
    * Determinism: bucket counts exact int64, each share divides once,
    * each bucket term rounds to 9 AT BIRTH and sums by a bin-ordered
    * fold (the PSI/ECE discipline), jsd rounds to 6. Groups present in
    * only one snapshot are dropped — count drift is [[profile]]'s job.
    *
    * Scale shape: identical to [[distributionDrift]] — two
    * (group, bucket)-keyed count aggregations, one group-keyed join of
    * ≤B-row bucket tables, one ≤B-struct fold per group; never a
    * row-level ref × cur join. */
  def jsDivergenceDrift(ref: DataFrame, cur: DataFrame, groupCol: String,
                        scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    def bucketed(df: DataFrame): DataFrame = df.select(
      col(groupCol).as("g"),
      greatest(least(ceil(col(scoreCol) * bins).cast("long"),
        lit(bins.toLong)), lit(1L)).as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("n"))
    val r = bucketed(ref)
    val c = bucketed(cur)
    val rt = r.groupBy("g").agg(sum("n").as("n_ref"))
    val ct = c.groupBy("g").agg(sum("n").as("n_cur"))
    val p = col("nr").cast("double") / col("n_ref").cast("double")
    val q = col("nc").cast("double") / col("n_cur").cast("double")
    r.withColumnRenamed("n", "nr")
      .join(c.withColumnRenamed("n", "nc"), Seq("g", "b"), "full_outer")
      .select(col("g"), col("b"),
        coalesce(col("nr"), lit(0L)).as("nr"),
        coalesce(col("nc"), lit(0L)).as("nc"))
      .join(rt, Seq("g")).join(ct, Seq("g")) // inner: both snapshots only
      .withColumn("term", round(
        when(col("nr") > 0,
          p * log2(lit(2.0) * p / (p + q)) / 2.0).otherwise(0.0) +
        when(col("nc") > 0,
          q * log2(lit(2.0) * q / (p + q)) / 2.0).otherwise(0.0), 9))
      .groupBy("g", "n_ref", "n_cur")
      .agg(sort_array(collect_list(struct(col("b"), col("term"))))
        .as("terms"))
      .select(col("g").as(groupCol), col("n_ref"), col("n_cur"),
        round(expr(
          "aggregate(terms, cast(0 as double), (acc, x) -> acc + x.term)"),
          6).as("jsd"))
  }

  /** Kruskal-Wallis H (one-way rank ANOVA) over an int64 measure — the
    * k-SAMPLE extension of [[mannWhitney]], same midrank/tie machinery:
    * H = [12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)] / (1 − Σ(t³−t)/(N³−N)).
    * ONE row out: (n_groups, n, h).
    *
    * Determinism: doubled midranks (2·mid = 2·cum − c + 1) keep every
    * per-group rank sum an exact integer (R2_g = 2·R_g, so
    * R_g²/n_g = R2_g²/(4·n_g)); the tie cube is decimal(38,0) BEFORE
    * multiplying (the [[mannWhitney]] fix); the only non-commutative
    * double sum — Σ over groups — folds in GROUP-KEY order over the
    * bounded group list (the Krippendorff fold discipline), and h
    * composes exact integers through one fixed IEEE expression order.
    * Named bound: c_vg·(2·cum − c + 1) multiplies in int64 before the
    * decimal cast — exact while N < ~2³¹ (the [[assertPackBound]]
    * class of bound; no packing here, so nothing wraps the ranks
    * themselves). No reject flag: the χ²(k−1) critical value is a
    * quantile TABLE, not a closed form — callers compare h against
    * their df's critical value; the engine stays engine-exact.
    *
    * Scale shape: one (value, group)-keyed count aggregate, one
    * value-keyed rollup riding [[Sampling.rankedPrefixSums]], a join
    * back on the value key, and a groups-bounded 1-row fold. */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String)
      : DataFrame = {
    val counts = df.select(col(valueCol).cast("long").as("v"),
      col(groupCol).cast("string").as("g"))
      .filter(col("v").isNotNull && col("g").isNotNull)
      .groupBy("v", "g").agg(count(lit(1)).as("c_vg"))
    val cv = counts.groupBy("v").agg(sum(col("c_vg")).as("c"))
    val cum = Sampling.rankedPrefixSums(cv, Seq(col("v")), col("c"),
      "__r", "cum").select(col("v"), col("c").as("cval"), col("cum"))
    val per = counts.join(cum, "v")
      .groupBy("g")
      .agg(sum((col("c_vg") * (lit(2L) * col("cum") - col("cval") + 1L))
        .cast("decimal(38,0)")).as("r2g"),
        sum(col("c_vg")).as("ng"))
    val ties = cv.agg(
      sum(col("c").cast("decimal(38,0)") * col("c") * col("c") - col("c"))
        .as("tsum"),
      sum(col("c")).as("n"))
    val folded = per
      .select(struct(col("g"),
        ((col("r2g") * col("r2g")).cast("double") /
          (lit(4L) * col("ng")).cast("double")).as("term")).as("s"))
      .agg(count(lit(1)).as("n_groups"),
        sort_array(collect_list(col("s"))).as("terms"))
      .select(col("n_groups"),
        expr("aggregate(terms, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
          .as("ssum"))
    val nD = col("n").cast("double")
    val corr = lit(1.0) - col("tsum").cast("double") / (nD * nD * nD - nD)
    val hraw = lit(12.0) * col("ssum") / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    folded.crossJoin(broadcast(ties)).select(
      col("n_groups"), col("n"),
      when(col("n_groups") >= 2 && corr > 0.0, round(hraw / corr, 6))
        .otherwise(lit(null).cast("double")).as("h"))
  }

  /** Theil T inequality index over a POSITIVE int64 measure with the
    * exact between/within-group decomposition — [[giniIndex]]'s
    * additive sibling (Gini says HOW concentrated; Theil says WHERE:
    * T = T_between + Σ_g s_g·T_g, so "is the token-count inequality a
    * cross-source story or inside each source?" is one row):
    * T = (Σ x·ln x)/S − ln(S/n), T_b = Σ_g (S_g/S)·ln(S_g·n/(n_g·S)),
    * T_w = Σ_g (S_g/S)·((L_g/S_g) − ln(S_g/n_g)). ONE row out:
    * (n, n_groups, theil, t_between, t_within) — prefixed names keep
    * the SQL oracle clear of the BETWEEN keyword; spec checks the
    * identity.
    *
    * Determinism: counts and value sums exact decimal(38,0); the only
    * row-shaped double sum, Σ x·ln x, birth-rounds each x·ln(x) to 9
    * and accumulates as DECIMAL(28,9) — exact and ORDER-FREE (the
    * calibration trick, lifting the bounded-fold requirement off the
    * hot path); the ≤k per-group terms round 9 at birth and fold in
    * group-key order; outputs round 6. Zero/negative values are
    * DROPPED (Theil is undefined there — the named convention;
    * n counts kept rows only).
    *
    * Scale shape: one group-keyed aggregate with map-side partials, a
    * k-struct fold, a 1-row result. NAMED BOUND: x·ln(x) must fit
    * DECIMAL(28,9)'s 19 integer digits — safe to x ~ 4·10¹⁷. */
  def theilIndex(df: DataFrame, valueCol: String, groupCol: String)
      : DataFrame = {
    val base = df.select(col(valueCol).cast("long").as("v"),
        col(groupCol).cast("string").as("g"))
      .filter(col("v").isNotNull && col("v") > 0 && col("g").isNotNull)
    val per = base.groupBy("g").agg(
      count(lit(1)).as("ng"),
      sum(col("v").cast("decimal(38,0)")).as("sg"),
      sum(round(col("v").cast("double") * log(col("v").cast("double")), 9)
        .cast("decimal(28,9)")).as("lg"))
    val folded = per.agg(
      sum(col("ng")).as("n"), count(lit(1)).as("n_groups"),
      sum(col("sg")).as("s"), sum(col("lg")).as("l"),
      sort_array(collect_list(struct(col("g"), col("ng"), col("sg"),
        col("lg")))).as("gs"))
    val sD = "cast(s as double)"
    val nD = "cast(n as double)"
    folded.select(col("n"), col("n_groups"),
      when(col("s") > 0, round(
        col("l").cast("double") / col("s").cast("double") -
          log(col("s").cast("double") / col("n").cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("theil"),
      when(col("s") > 0, round(expr(
        s"""aggregate(gs, cast(0 as double), (acc, x) -> acc + round(
           |  (cast(x.sg as double) / $sD)
           |  * ln(cast(x.sg as double) * $nD
           |      / (cast(x.ng as double) * $sD)), 9))""".stripMargin), 6))
        .otherwise(lit(null).cast("double")).as("t_between"),
      when(col("s") > 0, round(expr(
        s"""aggregate(gs, cast(0 as double), (acc, x) -> acc + round(
           |  (cast(x.sg as double) / $sD)
           |  * (cast(x.lg as double) / cast(x.sg as double)
           |     - ln(cast(x.sg as double) / cast(x.ng as double))), 9))
           |""".stripMargin), 6))
        .otherwise(lit(null).cast("double")).as("t_within"))
  }

  /** Exact trimmed + winsorized mean over an int64 measure — the
    * robust-location pair beside [[madOutliers]]' robust-spread (a
    * heavy-tailed length distribution makes the plain mean a lie;
    * the trimmed mean drops the tails, the winsorized mean clamps
    * them, and disagreement between the three IS the tail report):
    * with n rows and lo = n·trimNum div trimDen cut from EACH side,
    * trimmed = mean of ranks (lo, n−lo], winsorized = mean with the
    * bottom lo replaced by the value at rank lo+1 and the top lo by
    * the value at rank n−lo. ONE row out:
    * (n, n_kept, trimmed_mean, winsorized_mean).
    *
    * Determinism: rank arithmetic is exact per-value interval clipping
    * on the [[Sampling.rankedPrefixSums]] cumulative counts (value v
    * contributes min(cum, hi) − max(cum−c, lo) clamped at 0 — no row
    * ever ranks individually); sums are decimal(38,0); each mean is
    * ONE IEEE division, round 6. No quantile interpolation, no float
    * boundary — the [[madOutliers]] discipline.
    *
    * Scale shape: one value-keyed count aggregate, one ranked pass,
    * a 1-row reduce. */
  def trimmedMean(df: DataFrame, valueCol: String,
                  trimNum: Long = 5, trimDen: Long = 100): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && trimNum * 2 < trimDen,
      "trim fraction must be in [0, 1/2)")
    val counts = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val cum = Sampling.rankedPrefixSums(counts, Seq(col("v")), col("c"),
      "__r", "cum")
    val tot = cum.agg(max(col("cum")).as("n"))
    val base = cum.crossJoin(broadcast(tot))
      .withColumn("lo", expr(s"n * ${trimNum}L div ${trimDen}L"))
      .withColumn("hi", col("n") - expr(s"n * ${trimNum}L div ${trimDen}L"))
    val agg = base.agg(
      max(col("n")).as("n"), max(col("lo")).as("lo"), max(col("hi")).as("hi"),
      sum(col("v").cast("decimal(38,0)") *
        greatest(lit(0L), least(col("cum"), col("hi")) -
          greatest(col("cum") - col("c"), col("lo")))).as("tsum"),
      min(when(col("cum") >= col("lo") + 1, col("v"))).as("vlo"),
      min(when(col("cum") >= col("hi"), col("v"))).as("vhi"))
    agg.select(col("n"),
      (col("hi") - col("lo")).as("n_kept"),
      when(col("hi") > col("lo"),
        round(col("tsum").cast("double") /
          (col("hi") - col("lo")).cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("trimmed_mean"),
      when(col("n") > 0,
        round((col("tsum") + col("lo").cast("decimal(38,0)") *
          (col("vlo") + col("vhi"))).cast("double") /
          col("n").cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("winsorized_mean"))
  }

  /** Sample autocorrelation of the hourly event-count series at lags
    * 1..maxLag — the seasonality probe over the `events` stream (a
    * daily cycle shows as r₂₄ ≫ r₁-noise; a flat ACF says hourly
    * arrivals are memoryless, so downstream samplers may treat hours
    * as exchangeable): r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)² over the
    * COMPLETED hour grid [min, max] (missing hours are true zero
    * counts, not gaps — the calendar is the population). One row per
    * lag: (lag, n_hours, r).
    *
    * Determinism: multiply through by n² — dev_t = n·x_t − S is an
    * exact int64 and both Σdev_a·dev_b and Σdev² accumulate as
    * decimal(38,0); r_k is ONE IEEE division, round 6. Zero variance
    * (constant series) reports NULL r.
    *
    * Scale shape: one hour-keyed count aggregate (map-side partials —
    * the only row-scaled step), then everything runs on the hour GRID:
    * sequence-exploded from a 1-row min/max, broadcast-joined to
    * counts and to itself at +k. NAMED BOUND: the grid is
    * hours-in-range (720 here, ~9·10⁴ for a decade) — calendar-sized,
    * never data-sized; n·x must stay below 2⁶³ (hours × per-hour
    * count ~ 10¹⁹ only past ~10¹⁴ events/hour). */
  /** The COMPLETED hourly-count grid shared by the temporal family
    * ([[autocorrelation]] / [[mannKendall]] / [[theilSen]] /
    * [[seasonalityStrength]] / [[cusumChangepoint]]): one hour-keyed
    * count aggregate (the only row-scaled step), sequence-exploded to
    * the full [min, max] calendar range with missing hours as TRUE
    * ZERO counts. Grid size is calendar-bounded, never data-sized.
    *
    * Hour ids use FLOOR division — `(u − pmod(u, 3600)) div 3600` is
    * exact-integer floor for either sign — matching the oracle's
    * DuckDB `//` on pre-1970 timestamps too (Spark's bare `div`
    * truncates toward zero, the named sign-split hazard theilSen
    * documents; fixtures are post-1970 so the two only diverge on
    * negative epochs, which is exactly when a silent mismatch would
    * have surfaced). */
  private def hourlyGrid(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.select(
        expr(s"(unix_timestamp($tsCol) - pmod(unix_timestamp($tsCol), 3600)) div 3600")
        .as("hid"))
      .filter(col("hid").isNotNull)
      .groupBy("hid").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min(col("hid")).as("h0"), max(col("hid")).as("h1"))
    bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("hid"))
      .join(counts, Seq("hid"), "left")
      .select(col("hid"), coalesce(col("c"), lit(0L)).as("x"))
  }

  def autocorrelation(df: DataFrame, tsCol: String, maxLag: Int)
      : DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val grid = hourlyGrid(df, tsCol)
    val stats = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val dev = grid.crossJoin(broadcast(stats))
      .select(col("hid"), (col("n") * col("x") - col("s")).as("d"),
        col("n"))
    val den = dev.agg(
      sum(col("d").cast("decimal(38,0)") * col("d")).as("den"),
      max(col("n")).as("n"))
    val lags = broadcast(df.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag")))
    val num = dev.crossJoin(lags)
      .select((col("hid") + col("lag")).as("hid"), col("lag"),
        col("d").as("da"))
      .join(broadcast(dev.select(col("hid"), col("d").as("db"))), "hid")
      .groupBy("lag")
      .agg(sum(col("da").cast("decimal(38,0)") * col("db")).as("num"))
    num.crossJoin(broadcast(den))
      .select(col("lag"), col("n").as("n_hours"),
        when(col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("r"))
  }

  /** Mann-Kendall trend test over the hourly event-count series — the
    * nonparametric "is volume drifting?" monitor pairing
    * [[autocorrelation]]'s seasonality probe (MK asks about MONOTONE
    * trend, immune to the spikes that wreck a least-squares slope):
    * S = Σ_{i<j} sign(x_j − x_i) over the completed hour grid,
    * Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18 with the tie
    * correction, z with the ±1 continuity correction. ONE row out:
    * (n_hours, s, z, trend ∈ increasing/decreasing/none).
    *
    * Determinism: S is an exact int64 from the half-grid join (grid ×
    * grid on hour order — calendar-bounded, the [[autocorrelation]]
    * bound); the tie term and Var(S) numerator are exact decimals; z
    * is one IEEE composition, round 6, judged at the pinned 1.959964.
    * All values tied reports NULL z/trend, never 0/0. */
  def mannKendall(df: DataFrame, tsCol: String): DataFrame = {
    val grid = hourlyGrid(df, tsCol)
    val b = broadcast(grid.select(col("hid").as("hid2"), col("x").as("x2")))
    val s = grid.join(b, col("hid2") > col("hid"))
      .agg(coalesce(sum(signum(col("x2") - col("x")).cast("long")), lit(0L))
        .as("s"))
    val ties = grid.groupBy("x").agg(count(lit(1)).as("t"))
      .agg(sum(col("t").cast("decimal(38,0)") * (col("t") - 1) *
        (lit(2L) * col("t") + 5)).as("tsum"),
        sum(col("t")).as("n"))
    val nD = col("n").cast("decimal(38,0)")
    val varS = (nD * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tsum"))
      .cast("double") / 18.0
    val z = when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varS))
      .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    s.crossJoin(broadcast(ties)).select(
      col("n").as("n_hours"), col("s"),
      when(varS > 0.0, round(z, 6))
        .otherwise(lit(null).cast("double")).as("z"),
      when(varS > 0.0,
        when(abs(z) > 1.959964 && col("s") > 0, "increasing")
          .when(abs(z) > 1.959964 && col("s") < 0, "decreasing")
          .otherwise("none"))
        .otherwise(lit(null).cast("string")).as("trend"))
  }

  /** Theil-Sen robust trend slope over the hourly event-count series —
    * the MAGNITUDE beside [[mannKendall]]'s direction (the median of
    * all pairwise slopes shrugs off up to ~29% outliers; the pair
    * report "MK rejects + Theil-Sen says +0.4 docs/hour" is the drift
    * ticket): slope = lower-median over i<j of (x_j − x_i)/(h_j − h_i),
    * each pairwise slope fixed-pointed at 1e-6 BEFORE ranking. ONE row
    * out: (n_hours, n_pairs, slope).
    *
    * Determinism: slope_fp = sign(dy)·((|dy|·10⁶) div dx) — the
    * division runs on NON-NEGATIVE operands and the sign applies
    * after (the [[Embeddings]] ABTT sign-split discipline: Spark `div`
    * truncates toward zero, DuckDB `//` floors, and they agree only
    * away from negatives); the median is the exact rank-selected
    * lower median over the pair multiset ([[madOutliers]] machinery —
    * no interpolation). Pair count is calendar-bounded (~n²/2 grid
    * pairs). */
  def theilSen(df: DataFrame, tsCol: String): DataFrame = {
    val grid = hourlyGrid(df, tsCol)
    val b = broadcast(grid.select(col("hid").as("hid2"), col("x").as("x2")))
    val slopes = grid.join(b, col("hid2") > col("hid"))
      .select(expr("CAST(signum(x2 - x) AS BIGINT) * " +
        "((abs(x2 - x) * 1000000L) div (hid2 - hid))").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val cum = Sampling.rankedPrefixSums(slopes, Seq(col("v")), col("c"),
      "__r", "cum")
    val tot = cum.agg(max(col("cum")).as("np"))
    val med = cum.crossJoin(broadcast(tot))
      .filter(col("cum") - col("c") < expr("(np + 1) div 2") &&
        expr("(np + 1) div 2") <= col("cum"))
      .select(col("np"), col("v"))
    val n = grid.agg(count(lit(1)).as("n_hours"))
    n.crossJoin(broadcast(med))
      .select(col("n_hours"), col("np").as("n_pairs"),
        round(col("v").cast("double") / 1e6, 6).as("slope"))
  }

  /** Hour-of-day seasonality profile with the variance-explained
    * strength η² — the SHAPE companion to [[autocorrelation]]'s lag
    * view (η² near 1: volume is a clock; near 0: hour-of-day tells
    * you nothing, so schedulers may treat hours as exchangeable):
    * one row per hour-of-day bucket (how, n_hours, total, mean) with
    * η² = SS_between/SS_total = (Σ_g S_g²/n_g − S²/N)/(Q − S²/N)
    * repeated on every row (the calibration ECE convention).
    *
    * Determinism: all sums exact int64/decimal; the 24-bounded
    * per-group Σ S_g²/n_g terms round to 9 at birth and fold in
    * how-order; η² is one IEEE composition, round 6 (NULL when the
    * series is constant — no variance to explain). */
  def seasonalityStrength(df: DataFrame, tsCol: String): DataFrame = {
    val grid = hourlyGrid(df, tsCol)
      .withColumn("how", pmod(col("hid"), lit(24L)))
    val per = grid.groupBy("how").agg(
      count(lit(1)).as("ng"),
      sum(col("x")).as("sg"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("qg"))
    val folded = per.agg(
      sum(col("ng")).as("n"), sum(col("sg")).as("s"), sum(col("qg")).as("q"),
      sort_array(collect_list(struct(col("how"), col("ng"), col("sg"))))
        .as("gs"))
    val nD = col("n").cast("double")
    val sD = col("s").cast("double")
    val ssb = expr(
      """aggregate(gs, cast(0 as double), (acc, g) -> acc + round(
        |  cast(g.sg as double) * cast(g.sg as double) / g.ng, 9))
        |""".stripMargin) - sD * sD / nD
    val sst = col("q").cast("double") - sD * sD / nD
    per.crossJoin(broadcast(folded.select(col("n"), col("s"), col("q"),
        col("gs"))))
      .select(col("how"), col("ng").as("n_hours"), col("sg").as("total"),
        round(col("sg").cast("double") / col("ng").cast("double"), 6)
          .as("mean"),
        when(sst > 0.0, round(ssb / sst, 6))
          .otherwise(lit(null).cast("double")).as("eta2"))
  }

  /** CUSUM changepoint scan over the hourly event-count series — WHERE
    * the level shifted, completing the temporal family (ACF: is it
    * periodic; MK/Theil-Sen: is it trending; this: did it JUMP — the
    * ingest-pipeline incident detector): the peak of the cumulative
    * deviation |C_k| = |Σ_{t≤k}(x_t − mean)| and the earliest hour
    * offset achieving it. ONE row out:
    * (n_hours, change_offset, cusum_peak).
    *
    * Determinism: multiplied through by n — dev = n·x − S is exact
    * int64, the running C_k rides [[Sampling.rankedPrefixSums]] in
    * hour order, the argmax breaks ties toward the EARLIEST hour via
    * one max(struct); cusum_peak = peak/n is one IEEE division,
    * round 6. A constant series reports peak 0 at offset 0. */
  def cusumChangepoint(df: DataFrame, tsCol: String): DataFrame = {
    val grid = hourlyGrid(df, tsCol)
    val stats = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
      min(col("hid")).as("h0"))
    val dev = grid.crossJoin(broadcast(stats))
      .select(col("hid"), col("n"), col("h0"),
        (col("n") * col("x") - col("s")).as("d"))
    val cum = Sampling.rankedPrefixSums(dev, Seq(col("hid")), col("d"),
      "__r", "ck")
    cum.agg(max(col("n")).as("n_hours"),
        max(struct(abs(col("ck")).as("a"), (col("h0") - col("hid")).as("nh")))
          .as("m"))
      .select(col("n_hours"),
        (-col("m.nh")).as("change_offset"),
        round(col("m.a").cast("double") / col("n_hours").cast("double"), 6)
          .as("cusum_peak"))
  }

  /** Benford's-law first-digit test over a positive int64 measure —
    * the classic fabricated-/truncated-data smell test for warehouse
    * profiling: observed first-significant-digit counts vs the Benford
    * masses p_d = log10(1 + 1/d), χ² = Σ (c_d − N·p_d)²/(N·p_d),
    * rejected at α = 0.05 against the df = 8 critical value. ONE row
    * out: (n, chi2, reject_05). Values < 1 (zero/negative have no
    * first significant digit) are dropped — documented, not silent.
    *
    * Determinism: the first digit comes from the exact integer→string
    * cast (identical in both engines — no float formatting anywhere);
    * the nine Benford masses are PINNED 12-decimal literals (the
    * 1.959964 convention — mathematical constants, not computed
    * transcendentals), as is the χ²(8) critical value 15.50731; the
    * nine χ² terms fold in digit order (the bounded-fold discipline)
    * and the flag compares the UNROUNDED statistic. */
  def benfordTest(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val probs = Seq(
      1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
      4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
      7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)
    val digits = probs.toDF("d", "p")
    val counts = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v") >= 1L)
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("d"))
      .groupBy("d").agg(count(lit(1)).as("c"))
    val full = broadcast(digits).join(counts, Seq("d"), "left")
      .select(col("d"), col("p"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = full.agg(sum(col("c")).as("n"))
    val cD = col("c").cast("double")
    val nD = col("n").cast("double")
    // n = 0 guard INSIDE the term: the empty-input row still carries
    // nine (d, c=0) rows, and an unguarded 0/0 is a checked-arithmetic
    // error under ANSI rather than the NULL the output contract wants
    val term = when(col("n") > 0,
      ((cD - nD * col("p")) * (cD - nD * col("p"))) / (nD * col("p")))
      .otherwise(lit(0.0))
    full.crossJoin(broadcast(tot))
      .select(struct(col("d"), term.as("term")).as("s"), col("n"))
      .groupBy("n")
      .agg(sort_array(collect_list(col("s"))).as("terms"))
      .select(col("n"),
        expr("aggregate(terms, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
          .as("chi2raw"))
      .select(col("n"),
        when(col("n") > 0, round(col("chi2raw"), 6))
          .otherwise(lit(null).cast("double")).as("chi2"),
        when(col("n") > 0, col("chi2raw") > 15.50731)
          .otherwise(lit(null).cast("boolean")).as("reject_05"))
  }

  /** Exact robust-outlier summary over an int64 measure: LOWER median
    * by rank selection, MAD = lower median of |x − med|, outliers at
    * the 3σ-equivalent cut |x − med| > 3·1.4826·MAD — compared in
    * EXACT integer form (|x − med|·10000 > 44478·MAD), so the whole
    * operator is integer arithmetic end to end: no quantile
    * interpolation, no float threshold, engine-exact by construction.
    * ONE row out: (n, median, mad, n_outliers).
    *
    * Scale shape: two value-keyed count aggregates each riding ONE
    * [[Sampling.rankedPrefixSums]] pass (median, then MAD), the
    * selected medians broadcast back as 1-row joins; the outlier count
    * is a map-side sum. MAD = 0 (over half the values identical)
    * flags every x ≠ med — the honest degenerate case, named here. */
  def madOutliers(df: DataFrame, valueCol: String): DataFrame = {
    val base = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    def lowerMedian(d: DataFrame, cName: String, out: String): DataFrame = {
      val cv = d.groupBy(cName).agg(count(lit(1)).as("cnt"))
      val cum = Sampling.rankedPrefixSums(cv, Seq(col(cName)), col("cnt"),
        "__r", "cum")
      val tot = cum.agg(max(col("cum")).as("nn"))
      cum.crossJoin(broadcast(tot))
        .filter(col("cum") >= expr("(nn + 1) div 2"))
        .agg(min(col(cName)).as(out))
    }
    val m1 = lowerMedian(base, "v", "m")
    val dev = base.crossJoin(broadcast(m1))
      .select(col("v"), col("m"), abs(col("v") - col("m")).as("dd"))
    val m2 = lowerMedian(dev.select(col("dd")), "dd", "mad")
    dev.crossJoin(broadcast(m2))
      .agg(count(lit(1)).as("n"),
        max(col("m")).as("median"),
        max(col("mad")).as("mad"),
        sum(when(col("dd") * 10000L > lit(44478L) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic over an int64 measure
    * (the distribution-shift test beside [[distributionDrift]]'s PSI:
    * PSI needs bins, KS is bin-free): D = max_v |F_a(v) − F_b(v)|,
    * with the max over the pooled distinct values. ONE row out:
    * (n_a, n_b, d, reject_05) — reject at α = 0.05 by the asymptotic
    * critical value c = 1.358·√((n_a+n_b)/(n_a·n_b)), compared in
    * EXACT integer form: D_num²·10⁶ > 1.844164·10⁶·(n_a+n_b)·n_a·n_b
    * with both sides decimal(38,0) (D_num ≤ n_a·n_b, so the square
    * needs int128-class width — the q_outliers pairing; no sqrt, no
    * float threshold).
    *
    * Scale shape: one value-keyed count aggregate; BOTH cumulative
    * counts ride ONE [[Sampling.rankedPrefixSums]] pass by packing
    * (c_a·2³¹ + c_b) into the fold value and decomposing the running
    * sum (exact while n_b < 2³¹ and n_a·2³¹ < 2⁶³); past the bound
    * [[assertPackBound]] raises LOUDLY on the exact int64 totals —
    * which are computed independently of the packing, because a
    * wrapped decomposition stays below 2³¹ by construction; the max
    * is a 1-row aggregate. */
  def ksTest(df: DataFrame, valueCol: String, inA: org.apache.spark.sql.Column)
      : DataFrame = {
    val m = 1L << 31
    val counts = df.select(col(valueCol).cast("long").as("v"),
      when(inA, 1L).otherwise(0L).as("a"))
      .filter(col("v").isNotNull)
      .groupBy("v")
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val cum = Sampling.rankedPrefixSums(counts, Seq(col("v")),
      col("ca") * m + col("cb"), "__r", "packed")
      .select(col("ca"), col("cb"),
        expr(s"packed div ${m}L").as("cum_a"),
        pmod(col("packed"), lit(m)).as("cum_b"))
    val tot = cum.agg(max(col("cum_a")).as("na"), max(col("cum_b")).as("nb"),
      // exact int64 totals INDEPENDENT of the packing — the loud bound
      // check cannot read max(cum_b) (a wrapped decomposition stays
      // below 2³¹ by construction)
      (sum(col("ca")) + sum(col("cb"))).as("tot_n"))
    val dnum = cum.crossJoin(broadcast(tot))
      .select(abs(col("cum_a").cast("decimal(38,0)") * col("nb") -
        col("cum_b").cast("decimal(38,0)") * col("na")).as("dn"),
        col("na"), col("nb"), col("tot_n"))
      .groupBy("na", "nb", "tot_n").agg(max(col("dn")).as("d_num"))
    dnum.select(
      when(assertPackBound(col("tot_n"), m, "ksTest").isNotNull,
        col("na")).as("n_a"),
      col("nb").as("n_b"),
      when(col("na") > 0 && col("nb") > 0, round(
        col("d_num").cast("double") /
          (col("na").cast("decimal(38,0)") * col("nb")).cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("d"),
      when(col("na") > 0 && col("nb") > 0,
        col("d_num") * col("d_num") * 1000000L >
          lit(1844164L).cast("decimal(38,0)") * (col("na") + col("nb")) *
            col("na") * col("nb"))
        .otherwise(lit(null).cast("boolean")).as("reject_05"))
  }
}
