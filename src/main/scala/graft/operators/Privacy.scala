package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators — the aggregate-level
  * counterpart of the per-string scrubbing in
  * [[graft.functions.TextAnalysis.redactPii]]: a training corpus that
  * carries structured user attributes (or a metadata sidecar published
  * with one) must not let rare attribute combinations single out an
  * individual. k-anonymity (Sweeney 2002) is the standard floor: every
  * released quasi-identifier combination must be shared by ≥ k rows.
  *
  * Scale shape: one shuffle on the quasi-identifier columns (a window
  * COUNT needs no sort buffer — Spark aggregates each group in one
  * pass), and the row count is unchanged; nothing here is quadratic or
  * driver-bound. Hot QI groups are the COMMON combinations — precisely
  * the ones that need no suppression — so skew cannot concentrate
  * sensitive work.
  */
object Privacy {

  /** Single-pass k-anonymity by suppression: every quasi-identifier
    * column of a row whose QI group has fewer than `k` members is
    * nulled (types preserved), and `qi_group_n` reports the ORIGINAL
    * group size so downstream audits can grade the suppression rate.
    * Non-QI columns pass through untouched.
    *
    * This is one suppression round, not full Samarati/Incognito
    * generalization-lattice search: suppressed rows collapse into an
    * all-null QI group that is itself released (standard practice —
    * the null group reveals only "rare combination", never which one).
    * Callers wanting hierarchy-aware coarsening (city→state→country)
    * should pre-map columns through their hierarchy and re-run. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "need QI columns and k >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    val counted = df.withColumn("qi_group_n", count(lit(1)).over(w))
    qiCols.foldLeft(counted) { (acc, c) =>
      acc.withColumn(c,
        when(col("qi_group_n") < k, lit(null)).otherwise(col(c)))
    }
  }

  /** The audit: per released QI group, its size and whether it meets
    * the floor — what a data-release review signs off on. Run AFTER
    * [[kAnonymize]] (expect only the all-null suppressed group below
    * k... which is exactly the rows whose identity was withheld) or
    * before it (to size the problem). */
  def anonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("meets_k", col("n") >= k)

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is
    * defeated by a homogeneous group — 50 rows sharing one QI
    * combination AND one sensitive value reveal that value for anyone
    * known to be in the group. Per QI group: its size, the number of
    * DISTINCT sensitive values, and whether it meets the diversity
    * floor `l`. Same single-shuffle shape as [[anonymityAudit]]
    * (count-distinct partials are map-side). */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("meets_l", col("n_sensitive") >= l)

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung of the release-audit ladder: l-diversity is defeated
    * by a group whose sensitive values are diverse but SKEWED (99
    * "flu" + 1 "cancer" vs a population at 50/50). Per QI group, the
    * Earth Mover's Distance between the group's distribution over an
    * ORDINAL sensitive attribute and the global one, with the paper's
    * ordered ground distance:
    *
    *   EMD = (1/(m−1)) · Σ_{i<m} | Σ_{j≤i} (p_j − q_j) |
    *
    * over the m distinct sensitive values in ascending order.
    *
    * Determinism: p_j − q_j = c_gj/n_g − c_j/n is kept as the exact
    * int64 numerator c_gj·n − c_j·n_g over the common denominator
    * n_g·n; cumulative sums and |·| stay integer, and ONE final IEEE
    * division by (m−1)·n_g·n produces the double — bit-identical
    * across engines (the q_classifier_score fixed-point discipline).
    * Named bound: c·n products cap at n², int64-safe to n ≈ 3·10⁹
    * rows — beyond that, pre-aggregate to value counts and scale
    * both sides down by their gcd (the q_chi2_features caveat).
    *
    * Scale shape: m is the SENSITIVE ATTRIBUTE's cardinality (small
    * by definition for an ordinal release column — this is bounded
    * model state, the q_vocab_coverage argument, and the one global
    * window here ranks those m rows only); the dense group×value
    * grid is G·m rows built by broadcasting the m-row value table
    * against the group table, the cumulative sum is a QI-partitioned
    * window, and every shuffle is QI-keyed. */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, t: Double): DataFrame = {
    require(qiCols.nonEmpty && t > 0, "need QI columns and t > 0")
    val sens = col(sensitiveCol)
    val base = df.select(qiCols.map(col) :+ sens: _*)
      .filter(sens.isNotNull)
    // global distribution: m distinct values ranked ascending (the
    // bounded global window — m = attribute cardinality), plus the
    // global row count as a 1-row cross join
    val valCounts = base.groupBy(sensitiveCol)
      .agg(count(lit(1)).as("c_global"))
    val ranked = valCounts.withColumn("v_idx",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(sens.asc)))
    val totals = base.agg(count(lit(1)).as("n_total"),
      countDistinct(sens).as("m_vals"))
    val groups = base.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_g"))
    val groupVal = base.groupBy(qiCols.map(col) :+ sens: _*)
      .agg(count(lit(1)).as("c_group"))
    // dense G×m grid: every group crossed with the (broadcast) m-row
    // value table, so zero-count cells contribute their −q_j mass
    val grid = groups
      .crossJoin(org.apache.spark.sql.functions.broadcast(ranked))
      .join(groupVal, qiCols :+ sensitiveCol, "left")
      .crossJoin(org.apache.spark.sql.functions.broadcast(totals))
      .withColumn("term_num",
        coalesce(col("c_group"), lit(0L)) * col("n_total") -
          col("c_global") * col("n_g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*).orderBy(col("v_idx").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = grid.withColumn("cum_num", sum(col("term_num")).over(w))
    // m_vals = 1 (a single global sensitive value): the v_idx < m_vals
    // filter would drop EVERY grid row and the audit would silently
    // return no groups — a hole in a release audit. Keep the single
    // v_idx = 1 row (its term_num is identically 0: c_group = n_g and
    // c_global = n_total) and pin emd = 0 / meets_t = true, guarding
    // the (m−1) denominator against 0/0.
    cum.filter(col("v_idx") < col("m_vals") || col("m_vals") === 1L)
      .groupBy((qiCols.map(col) :+ col("n_g") :+ col("m_vals") :+
        col("n_total")): _*)
      .agg(sum(abs(col("cum_num"))).as("emd_num"))
      .withColumn("emd0", when(col("m_vals") > 1L,
        col("emd_num").cast("double") /
          ((col("m_vals") - 1L) * col("n_g") * col("n_total")).cast("double"))
        .otherwise(lit(0.0)))
      .select((qiCols.map(col) :+ col("n_g") :+
        round(col("emd0"), 6).as("emd") :+
        (col("emd0") <= t).as("meets_t")): _*)
  }

  /** ε-differentially-private count release via the Laplace mechanism
    * (Dwork et al. 2006): per-group count + Lap(1/ε) noise — the
    * standard way a pipeline publishes per-source/per-language corpus
    * statistics without certifying any individual document's presence
    * (count queries have sensitivity 1, so scale b = 1/ε). Noise by
    * inverse CDF: u ∈ (0,1) from the salted 32-bit hash of the group
    * key, noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|).
    *
    * NAMED CAVEAT — this is the MECHANISM with a REPLAYABLE seed: the
    * hash-derived u makes the release deterministic so the oracle gate
    * can verify the arithmetic, but real DP requires fresh secret
    * randomness (a replayable seed leaks everything to anyone holding
    * the salt). Production swaps [[Sampling.hash32]] for a secure RNG;
    * everything else — sensitivity, scale, inverse CDF — is the
    * deployable code path.
    *
    * `salt` is the RELEASE IDENTIFIER and is deliberately REQUIRED (no
    * default): the noise is a pure function of (group, salt), so two
    * releases computed with the SAME salt over different data carry
    * identical noise per group — subtracting them reveals the exact
    * count delta, and anyone holding the salt can reconstruct the
    * noise outright. Give every release a fresh identifier; reusing
    * one is the deterministic-seed analog of Laplace noise reuse.
    *
    * Determinism: u = (h + ½)/2³² is exact (h < 2³², never 0 or 1);
    * the single ln birth-rounds the noise to 9; released rounds 6.
    * One group-keyed count aggregate, noise map-side — groups never
    * re-shuffle. */
  def laplaceCounts(df: DataFrame, groupCol: String, epsilon: Double,
                    salt: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val u = (Sampling.hash32(col("g"), salt).cast("double") + 0.5) /
      lit(4294967296.0)
    val c = u - 0.5
    val noise = round(lit(-1.0 / epsilon) *
      when(c >= 0, 1.0).otherwise(-1.0) *
      log(lit(1.0) - lit(2.0) * abs(c)), 9)
    df.select(col(groupCol).cast("string").as("g"))
      .filter(col("g").isNotNull)
      .groupBy("g").agg(count(lit(1)).as("n"))
      .select(col("g").as(groupCol),
        lit(epsilon).as("epsilon"),
        round(col("n").cast("double") + noise, 6).as("released"))
  }
}
