package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}

/** Group-level embedding aggregation: mean vectors ("centroids") per
  * source / cluster / language — the building block for source-drift
  * monitoring, topic profiling, cluster summarization, and seeding
  * coarse quantizers (IVF) from data instead of lowest-id rows.
  *
  * Scale + determinism design: the naive formulation
  * (`posexplode` → `groupBy(grp, pos).avg`) shuffles docs × dims rows,
  * and float summation order depends on partitioning, so two runs of
  * the same job can disagree in the last ulp — unacceptable for a
  * curation engine whose every other operator is reproducible. Instead
  * each component is quantized to FIXED POINT (`floor(x · 10⁹)` — floor
  * has no rounding-tie ambiguity across engines) and summed as a long:
  * exact 64-bit integer addition is associative and commutative, so the
  * partial aggregation is map-side (one d-long buffer per group per
  * partition), the shuffle carries one buffer per group, and the result
  * is bit-identical on ANY partitioning and engine — which the DuckDB
  * oracle checks. Dims up to ~2¹⁴ overflow-safe for ~2⁵⁰ rows per
  * group (|x|≤10⁴ after scaling ⇒ sums stay < 2⁶³).
  */
object Embeddings {

  /** Sums fixed-point-scaled components; slot 0 of the buffer is the
    * row count, slots 1..d the component sums. Associative integer
    * merge — the same map-side posture as [[graft.plans.MinSigAggregator]]. */
  class FixedPointSumAggregator(scale: Double)
      extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], emb: Seq[Double]): Array[Long] = {
      val b = if (buf.isEmpty) new Array[Long](emb.length + 1) else buf
      b(0) += 1L
      var i = 0
      while (i < emb.length) {
        b(i + 1) += math.floor(emb(i) * scale).toLong
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group mean embedding, exact and partition-order-independent.
    * Output is the EXPLODED form (grp, pos, value) — one row per group
    * per dimension (groups × dims rows, tiny), value = the fixed-point
    * mean rounded to 6 decimals. `scale` sets the fixed-point grid
    * (10⁹ ≈ nano precision, far below any embedding's signal). */
  def groupCentroids(df: DataFrame, grpCol: String, embCol: String,
                     scale: Double = 1e9): DataFrame = {
    val sumAgg = udaf(new FixedPointSumAggregator(scale))
    df.select(col(grpCol).as("grp"),
        Similarity.asDouble(col(embCol)).as("emb"))
      .groupBy(col("grp"))
      .agg(sumAgg(col("emb")).as("sums"))
      .select(col("grp"), posexplode(expr("slice(sums, 2, size(sums) - 1)"))
        .as(Seq("pos0", "s")),
        element_at(col("sums"), 1).as("n"))
      .select(col("grp"), (col("pos0") + 1).cast("int").as("pos"),
        round(col("s").cast("double") / lit(scale) / col("n").cast("double"), 6)
          .as("value"))
  }

  /** k-center greedy diversity selection (farthest-point traversal —
    * the classic 2-approximation of k-center, used as the coreset /
    * diverse-subset construction in data-selection pipelines, e.g.
    * Sener & Savarese 2018's active-learning k-Center): start from the
    * lowest id, then k−1 times pick the point with the LARGEST minimum
    * squared-L2 distance to everything already selected (ties by
    * lowest id). Returns one row per selection round:
    * (round, vec_id, min_dist = the max-min distance that won the
    * round, 0 for the seed).
    *
    * Scale + determinism: the selected centers are BOUNDED DRIVER
    * MODEL STATE (k vectors — the IVF-centroid discipline), each round
    * is ONE corpus map pass (min distance to ≤k broadcast center
    * literals, `least` over fused index-ordered folds) ending in a
    * TakeOrdered top-1, never a full sort; O(k) passes total, k is a
    * selection budget (tens), never corpus-sized. Squared L2 is an
    * index-ordered left fold of exact doubles and `min` over centers
    * is exactly commutative, so every round's argmax replays in SQL
    * (`q_kcenter_select`'s materialized per-round CTEs). */
  def kCenterGreedy(df: DataFrame, idCol: String, embCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val p = df.select(Sampling.strictLongId(col(idCol), "kCenterGreedy").as("id"),
      Similarity.asDouble(col(embCol)).as("emb"))
    // fused squared-L2 kernel — bit-identical to the zip_with fold
    // (VectorExpressionsSpec pins it), zero allocation per candidate
    def sqDist(a: org.apache.spark.sql.Column, c: Seq[Double]) =
      graft.plans.VectorExpressions.vec_sqdist(a, typedLit(c))
    val first = p.orderBy(col("id")).limit(1).collect().head
    var centers = Vector((first.getLong(0), first.getSeq[Double](1)))
    val out = Seq.newBuilder[(Int, Long, Double)]
    out += ((1, centers.head._1, 0.0))
    for (r <- 2 to k) {
      val mind = centers.map { case (_, c) => sqDist(col("emb"), c) }
        .reduce(least(_, _))
      val sel = p.filter(!col("id").isInCollection(centers.map(_._1)))
        .select(col("id"), col("emb"), mind.as("mind"))
        .orderBy(desc("mind"), asc("id")).limit(1).collect()
      if (sel.nonEmpty) {
        val cand = sel.head
        centers = centers :+ ((cand.getLong(0), cand.getSeq[Double](1)))
        out += ((r, cand.getLong(0), cand.getDouble(2)))
      }
    }
    out.result().toDF("round", "vec_id", "min_dist")
      .select(col("round"), col("vec_id"),
        round(col("min_dist"), 6).as("min_dist"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein
    * 1998): k greedy rounds, each picking the candidate maximizing
    * λ·rel(d) − (1−λ)·max_{s∈S} dot(d, s) — the standard
    * relevance-vs-redundancy re-ranker for retrieval results and the
    * relevance-aware sibling of [[kCenterGreedy]] (which optimizes
    * diversity alone). The seed round has S = ∅, so its score is
    * λ·rel by the same formula (max over nothing contributes 0). Pass
    * L2-normalized embeddings for cosine semantics — the operator
    * uses the raw dot product. Returns one row per round:
    * (round, vec_id, rel, mmr), ties broken by lowest id.
    *
    * Scale + determinism: the kCenterGreedy discipline exactly — the
    * selected set is BOUNDED DRIVER MODEL STATE (k vectors, a
    * selection budget of tens), each round is ONE corpus map pass
    * (dot against ≤k broadcast center literals through the fused
    * index-ordered [[graft.plans.VectorExpressions.vec_dot]] fold,
    * `greatest` over centers exactly commutative) ending in a
    * TakeOrdered top-1, never a full sort. The score composes rel and
    * maxsim with a fixed IEEE op sequence, and the SQL replay embeds
    * the SCALA-computed λ and 1−λ doubles verbatim (1−0.7 is NOT the
    * literal 0.3 — printing the computed value keeps both engines on
    * identical bits), so the whole trajectory hash-matches
    * (`q_mmr_select`'s materialized per-round CTEs). */
  def mmrSelect(df: DataFrame, idCol: String, embCol: String,
                relCol: String, k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val p = df.select(Sampling.strictLongId(col(idCol), "mmrSelect").as("id"),
      Similarity.asDouble(col(embCol)).as("emb"),
      col(relCol).cast("double").as("rel"))
    def dot(a: org.apache.spark.sql.Column, c: Seq[Double]) =
      graft.plans.VectorExpressions.vec_dot(a, typedLit(c))
    val first = p.orderBy(desc("rel"), asc("id")).limit(1).collect().head
    var selected = Vector((first.getLong(0), first.getSeq[Double](1)))
    val out = Seq.newBuilder[(Int, Long, Double, Double)]
    out += ((1, first.getLong(0), first.getDouble(2),
      lambda * first.getDouble(2)))
    for (r <- 2 to k) {
      val maxsim = selected.map { case (_, c) => dot(col("emb"), c) }
        .reduce(greatest(_, _))
      val score = lit(lambda) * col("rel") - lit(1.0 - lambda) * maxsim
      val sel = p.filter(!col("id").isInCollection(selected.map(_._1)))
        .select(col("id"), col("emb"), col("rel"), score.as("mmr"))
        .orderBy(desc("mmr"), asc("id")).limit(1).collect()
      if (sel.nonEmpty) {
        val cand = sel.head
        selected = selected :+ ((cand.getLong(0), cand.getSeq[Double](1)))
        out += ((r, cand.getLong(0), cand.getDouble(2), cand.getDouble(3)))
      }
    }
    out.result().toDF("round", "vec_id", "rel", "mmr")
      .select(col("round"), col("vec_id"), col("rel"),
        round(col("mmr"), 6).as("mmr"))
  }

  /** Top principal direction of an embedding corpus by FIXED-POINT
    * power iteration, plus each vector's projection onto it — the
    * "all-but-the-top" (ABTT) post-processing statistic (Mu &
    * Viswanath, ICLR 2018): subtracting the mean and the dominant
    * component(s) measurably improves embedding isotropy, and the
    * dominant-direction projection is itself the corpus's strongest
    * nuisance axis (frequency). Returns (component, projections):
    * the final 2^20-scaled direction (driver-side, `dim` longs) and a
    * (id, proj_fp) DataFrame.
    *
    * Determinism: floats quantize to floor(x·2^20) longs at birth
    * (floor has no tie ambiguity), the mean is centered in integers,
    * and every iteration is integer-only — dot products are int64
    * folds, the matvec Σ_v d_v·q_v accumulates per-partition long
    * arrays (the perceptron discipline: ≤ numPartitions × dim partial
    * vectors to the driver per round), and rescaling divides by
    * max|s| via SIGN-SPLIT division (a div b on |a|, sign restored) —
    * Spark's `div` truncates toward zero while DuckDB's `//` floors,
    * so negative operands would silently diverge; the sign-split form
    * makes both engines compute the identical quotient. The whole
    * trajectory replays in SQL via materialized per-iteration CTEs.
    *
    * Scale shape: one quantize+center map pass, then per iteration
    * ONE corpus map pass (dot against the broadcast-literal direction,
    * O(1) plan size in dim) + one bounded partial-vector collect;
    * driver state is dim longs. NAMED int64 bound: with unit-scale
    * embeddings, |d2·q| ≈ 2^43 per vector, so the component sums stay
    * in int64 up to ~10^6-vector PARTITIONS and ~2^63/(2^43) ≈ 10^6
    * rows per partial — per-partition partials push the corpus bound
    * to numPartitions × that; past it, widen the dot downshift. */
  def topComponentFixedPoint(df: DataFrame, idCol: String, embCol: String,
                             dim: Int, iterations: Int = 4)
      : (Seq[Long], DataFrame) = {
    require(iterations >= 1 && iterations <= 16, "iterations out of range")
    val spark = df.sparkSession
    import spark.implicits._
    def sdiv(a: Long, b: Long): Long = if (a >= 0) a / b else -((-a) / b)
    val q = df.select(
      Sampling.strictLongId(col(idCol), "topComponentFixedPoint").as("id"),
      col(embCol).as("e0"))
      .select(col("id"), expr(
        "transform(e0, e -> CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT))")
        .as("q"))
    val meanRows = q.select(posexplode(col("q")))
      .groupBy("pos").agg(sum("col").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val mean: Seq[Long] = meanRows.sortBy(_._1).map { case (_, s, n) =>
      sdiv(s, n)
    }.toSeq
    val qc = q.select(col("id"),
      zip_with(col("q"), typedLit(mean), (a, b) => a - b).as("qc"))
      .persist()
    try {
      val x = Array.fill(dim)(1L << 20)
      def dotCol: org.apache.spark.sql.Column = {
        val xs = x.mkString(",")
        expr(s"aggregate(zip_with(qc, array($xs), (a, b) -> a * b), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
      }
      val d2 = "CASE WHEN dot >= 0 THEN dot div 1073741824 " +
        "ELSE -((-dot) div 1073741824) END"
      for (_ <- 1 to iterations) {
        val partials = qc.select(col("qc"), dotCol.as("dot"))
          .select(expr(s"transform(qc, c -> ($d2) * c)").as("gx"))
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
        val s = Array.fill(dim)(0L)
        for (g <- partials; j <- 0 until dim) s(j) += g(j)
        val divisor = math.max(s.map(v => math.abs(v)).max / 1048576L, 1L)
        for (j <- 0 until dim) x(j) = sdiv(s(j), divisor)
      }
      // the projection re-derives the dot against the FINAL direction
      val projFinal = qc.select(col("id").as(idCol), dotCol.as("dot"))
        .select(col(idCol), expr(d2).as("proj_fp"))
      (x.toSeq, projFinal)
    } finally qc.unpersist(blocking = false)
  }
}
