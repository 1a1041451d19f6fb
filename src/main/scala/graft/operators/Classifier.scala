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
    * Returns the full weight trajectory: (round, weights) per round.
    *
    * Plan size is O(1) in `dim`: the weights enter each round as ONE
    * array literal, the dot is a codegen'd zip_with+aggregate fold,
    * and the misclassified gradient Σ y·x is summed element-wise
    * inside each partition (one long[] accumulator — the map-side
    * combine, written out), with ≤numPartitions partial vectors
    * merged on the driver. (The pre-round-7 form expanded `dim`
    * literal product terms and `dim` sum columns into the plan —
    * fine at dim=16, quadratic plan-compile pain at the 2^18 of a
    * real hashed-feature classifier.) Integer addition is order-free,
    * so the trajectory stays bit-reproducible under any partitioning
    * — ClassifierSpec pins dim=16 values unchanged and plans+runs
    * dim=1024. */
  def trainPerceptron(docs: DataFrame, featCol: Column, labelCol: Column,
      dim: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of range")
    val spark = docs.sparkSession
    import spark.implicits._
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
        val dot = aggregate(
          zip_with(col("x"), typedLit(w.toSeq), (xi, wi) => xi * wi),
          lit(0L), _ + _)
        val partials = base.filter(col("y") * dot <= 0)
          .select(transform(col("x"), xi => col("y") * xi).as("gx"))
          .as[Seq[Long]]
          .mapPartitions { it =>
            val acc = Array.fill(dim)(0L)
            var any = false
            it.foreach { a =>
              any = true
              var i = 0
              while (i < dim) { acc(i) += a(i); i += 1 }
            }
            if (any) Iterator.single(acc.toSeq) else Iterator.empty
          }
          .collect() // ≤ numPartitions vectors of dim longs — bounded
        for (g <- partials; j <- 0 until dim) w(j) += g(j)
        out += ((r, w.toVector))
      }
      out.result()
    } finally base.unpersist()
  }

  /** Multinomial naive Bayes text classification (train + predict in
    * one plan) — the generative counterpart to the perceptron: class
    * priors and add-one-smoothed per-class token likelihoods from a
    * labeled corpus, then argmax_c [ ln p(c) + Σ_t ln p(t|c) ] per
    * document. The workhorse for cheap source/language/domain routing
    * where a linear model is already too much machinery.
    *
    * Determinism discipline: `ln` is NOT correctly-rounded by IEEE, so
    * engines may differ in the last ulp — every per-token and prior
    * log-likelihood is therefore rounded to 9 decimals AT BIRTH (a
    * 1-ulp input difference survives the rounding only within ~1e-15
    * of a boundary), after which the per-document sum is the house
    * left fold over the SORTED ll list — bit-identical across engines
    * and partitionings — and ranking uses the round-6 score with the
    * class name as tie-break.
    *
    * Scale shape: training is two token-keyed count aggregations
    * (map-side partials); the class table (prior + denominator per
    * class) is literally #classes rows — broadcast; scoring cross-
    * joins each token against that broadcast, left-joins the
    * (class, token) likelihood table (vocabulary-sized — AQE
    * broadcasts it when small), and rolls up per document. Driver
    * state: two scalars (doc total, vocabulary size) — the bounded
    * model state discipline. */
  def naiveBayes(train: DataFrame, docs: DataFrame, idCol: String,
                 textCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trTok = train.select(col(labelCol).as("cls"),
      explode(split(col(textCol), " ")).as("t"))
    val nDocs = train.count()
    val vocab = trTok.agg(countDistinct(col("t"))).head().getLong(0)
    val cls = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val tok = trTok.groupBy("cls", "t").agg(count(lit(1)).as("ctc"))
    val classTable = cls
      .join(tok.groupBy("cls").agg(sum("ctc").as("tc")), "cls")
      .select(col("cls"),
        round(log(col("n_docs").cast("double") / lit(nDocs).cast("double")), 9)
          .as("prior_ll"),
        (col("tc") + lit(vocab)).as("denom"))
    val dt = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("t"))
    val scored = dt
      .crossJoin(broadcast(classTable))
      .join(tok, Seq("cls", "t"), "left")
      .withColumn("ll",
        round(log((coalesce(col("ctc"), lit(0L)) + 1L).cast("double") /
          col("denom").cast("double")), 9))
      .groupBy("id", "cls", "prior_ll")
      .agg(sort_array(collect_list(col("ll"))).as("lls"))
      .select(col("id"), col("cls"),
        round(col("prior_ll") +
          expr("aggregate(lls, cast(0 as double), (acc, x) -> acc + x)"), 6)
          .as("score"))
    val w = Window.partitionBy("id").orderBy(desc("score"), asc("cls"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id").as(idCol), col("cls").as("pred"), col("score"))
  }

  /** χ²-test feature selection: the top-k tokens most associated with
    * each class by the 2×2 presence contingency test (Manning &
    * Schütze ch. 5 / scikit-learn's chi2 selector) — the standard
    * "which features should the router/quality classifier even look
    * at" pass that precedes [[trainPerceptron]] / [[naiveBayes]] at
    * corpus scale. Per (token, class): a = docs in class containing
    * token, b/c/d from the marginals; χ² = N·(ad−bc)² /
    * ((a+b)(c+d)(a+c)(b+d)), algebraically N·Δ²/(ta·(N−ta)·nc·(N−nc))
    * with Δ = ad−bc.
    *
    * Determinism: Δ and all four marginals are exact int64 (NAMED
    * bound: products ≤ N²/4 — exact to N ≈ 6e9 docs; widen to decimal
    * beyond); χ² is a fixed sequence of IEEE ops on those integers —
    * identical cross-engine — rounded to 6 BEFORE ranking (the house
    * round-then-rank rule), ties broken by token ascending. Scoped to
    * OBSERVED (class, token) pairs: a token absent from a class is
    * never a positive feature for it (χ² is direction-blind, so the
    * absent pair's score equals the present pair's — selecting it
    * would pick anti-features); a = 0 rows therefore don't exist by
    * construction. Zero-information edges (a token in every doc, a
    * single-class corpus) score 0, never inf/NaN.
    *
    * Scale shape: one distinct over (doc, class, token) — the presence
    * dedup, token-keyed with map-side partials — one (class, token)
    * count, one token-keyed marginal roll-up, and a #classes-row
    * broadcast; the per-class ranking goes through
    * [[Sampling.groupedPositions]]'s RANGE exchange on
    * (class, −χ², token) — never a row_number window partitioned by
    * the #classes-value key (the q_length_buckets lesson: a handful of
    * partitions means a handful of tasks at any cluster size). Driver
    * state: one scalar (N). */
  def chi2Features(train: DataFrame, idCol: String, textCol: String,
                   labelCol: String, topK: Int = 15): DataFrame = {
    val pres = train.select(col(idCol).as("id"), col(labelCol).as("cls"),
        explode(split(col(textCol), " ")).as("t"))
      .distinct()
    val n = train.select(col(idCol)).distinct().count()
    val a = pres.groupBy("cls", "t").agg(count(lit(1)).as("a"))
    val ta = a.groupBy("t").agg(sum("a").as("ta"))
    val nc = pres.select("id", "cls").distinct()
      .groupBy("cls").agg(count(lit(1)).as("nc"))
    val scored = a.join(ta, "t").join(broadcast(nc), "cls")
      .withColumn("delta",
        col("a") * (lit(n) - col("ta") - col("nc") + col("a")) -
          (col("ta") - col("a")) * (col("nc") - col("a")))
      // a token in EVERY doc (ta = N) or a single-class corpus
      // (nc = N) has a zero marginal denominator and zero signal:
      // χ² = 0 by convention, never inf/NaN
      .withColumn("chi2",
        when(col("ta") === n || col("nc") === n, lit(0.0))
          .otherwise(round(
            lit(n.toDouble) * col("delta") * col("delta") /
              (col("ta") * (lit(n) - col("ta"))).cast("double") /
              (col("nc") * (lit(n) - col("nc"))).cast("double"), 6)))
      .select(col("cls"), col("t").as("token"), col("a").as("df_class"),
        col("ta").as("df_total"), col("chi2"))
    Sampling.groupedPositions(scored, Seq("cls"),
        Seq(negate(col("chi2")), col("token")), "rank")
      .filter(col("rank") <= topK)
      .select(col("cls"), col("token"), col("df_class"), col("df_total"),
        col("chi2"), col("rank"))
  }

  /** c-TF-IDF cluster labeling (Grootendorst, "BERTopic: Neural topic
    * modeling with a class-based TF-IDF procedure", 2022): the top-k
    * DISTINCTIVE terms per cluster under
    * ctfidf = tf_{t,c} · ln(1 + A / f_t), with tf_{t,c} the term's
    * count inside the cluster, f_t its corpus count and A the average
    * cluster token mass — each cluster is one pseudo-document,
    * re-weighted by corpus rarity so shared filler drops out and the
    * surviving terms describe what distinguishes the cluster ITSELF.
    * The human-readable name layer for any clustering the pipeline
    * produces: near-dup clusters, semantic LSH clusters, source or
    * topic buckets.
    *
    * Determinism: counts are exact int64; A/f_t composes two IEEE
    * divisions in a fixed order; the ln rounds to 9 AT BIRTH and the
    * product to 6 BEFORE ranking (the pmi discipline); the per-cluster
    * rank goes through [[Sampling.groupedPositions]]'s range exchange
    * on (cluster, −score, term) — never a cluster-keyed window.
    *
    * Scale shape: two token-keyed count aggregations with map-side
    * partials, one vocabulary-sized term join (AQE-broadcastable),
    * one 1-row scalar broadcast, then the range-partitioned rank. */
  def clusterLabels(docs: DataFrame, clusterCol: String, textCol: String,
                    topK: Int = 5): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val toks = docs.select(col(clusterCol).as("c"),
      explode(expr(s"filter(split(`$textCol`, ' '), t -> t <> '')")).as("t"))
    val tf = toks.groupBy("c", "t").agg(count(lit(1)).as("tf"))
    val ft = toks.groupBy("t").agg(count(lit(1)).as("corpus_tf"))
    val scalars = tf.agg(sum("tf").as("total"),
      countDistinct(col("c")).as("nc"))
    val scored = tf.join(ft, "t")
      .crossJoin(broadcast(scalars))
      .withColumn("score", round(col("tf") *
        round(log(lit(1.0) +
          (col("total").cast("double") / col("nc").cast("double")) /
            col("corpus_tf").cast("double")), 9), 6))
      .select(col("c"), col("t"), col("tf"), col("corpus_tf"), col("score"))
    Sampling.groupedPositions(scored, Seq("c"),
        Seq(negate(col("score")), col("t")), "rank")
      .filter(col("rank") <= topK)
      .select(col("c").as(clusterCol), col("t").as("term"), col("tf"),
        col("corpus_tf"), col("score"), col("rank"))
  }
}
