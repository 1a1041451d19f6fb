package graft.operators

import org.apache.spark.sql.DataFrame
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
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}__nd"),
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
}
