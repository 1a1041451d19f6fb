package graft

import org.apache.spark.sql.functions.col
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),   // close to 0
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),   // orthogonal to 0
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 1),  // opposite of 0
    (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1)    // identical to 0
  ).toDF("vec_id", "embedding", "label")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val out = Similarity.cosinePairsBlocked(
      vecs.withColumn("blk", org.apache.spark.sql.functions.lit(0)),
      "vec_id", "embedding", "blk", threshold = -2.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((0L, 4L)) == 1.0)
    assert(out((0L, 2L)) == 0.0)
    assert(out((0L, 3L)) == -1.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak, self excluded") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 4L), (2, 1L), (3, 2L)))
  }

  test("diversityPrune: one representative per semantic cluster, rest untouched") {
    // 0 and 4 are identical, 1 is near-identical to both → one cluster
    // {0, 1, 4} keeps min id 0; 2 and 3 are unclustered at 0.9
    val kept = Similarity.diversityPrune(vecs, "vec_id", "embedding",
      threshold = 0.9, dims = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && kept.contains(2L) && kept.contains(3L))
    assert(!kept.contains(4L)) // identical twin of 0 pruned
  }

  test("lshTopK finds the identical vector (same bucket by construction)") {
    val out = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 2, dims = 4)
      .collect().map(r => r.getLong(2))
    assert(out.contains(4L))
  }

  test("ivfTopK finds the identical vector and ranks exactly within probed lists") {
    val out = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, nLists = 2, nProbe = 2, iters = 1)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    // probing both of 2 lists == exhaustive here -> must equal brute force
    assert(out.toSeq == Seq((1, 4L), (2, 1L), (3, 2L)))
  }

  test("approximate IVF (nProbe < nLists) recall vs brute force on the fixture") {
    // the suite's oracle covers the full-probe (exact) configuration;
    // this pins the APPROXIMATE path: partial probing still finds the
    // true nearest neighbors for every fixture query
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 4))
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF nProbe=4/8 recall@5 dropped to $recall")
    // approximate results are always SOUND: any returned neighbor exists
    // and is never the query itself
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("quantizedTopK: int8 ranking agrees with exact cosine on the fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val quant = pairs(Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", k = 5))
    val agree = (exact intersect quant).size.toDouble / exact.size
    assert(agree >= 0.8, s"int8 rank agreement dropped to $agree")
  }

  test("int8 quantization bounds reconstruction error by scale/2") {
    import graft.functions.Quantize
    val df = vecs.select(col("vec_id"),
      Quantize.int8(col("embedding")).as("z"), col("embedding"))
    val errs = df.select(
      Quantize.maxError(col("embedding"), col("z.q"), col("z.scale")).as("e"),
      (col("z.scale") / 2.0).as("bound")).collect()
    errs.foreach(r => assert(r.getDouble(0) <= r.getDouble(1) + 1e-12))
  }

  test("pqTopK: ADC inner-product recall vs brute force on normalized vectors") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // normalize so inner-product ranking == cosine ranking
    val emb = raw.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(
        Similarity.asDouble(col("embedding")),
        x => x / org.apache.spark.sql.functions.sqrt(
          Similarity.normSq(Similarity.asDouble(col("embedding"))))).as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    // ADC-only shortlist quality (no re-rank): weak by design
    val adcOnly = pairs(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, m = 8, ksub = 16))
    val adcRecall = (exact intersect adcOnly).size.toDouble / exact.size
    assert(adcRecall >= 0.15, s"raw ADC recall@5 collapsed to $adcRecall")
    // production shape: ADC shortlist of 25 + exact re-rank
    val pq = pairs(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, m = 8, ksub = 16, rerank = 25))
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ+rerank recall@5 dropped to $recall")
    assert(recall > adcRecall, "re-rank must improve on raw ADC")
    // determinism: same codes, same answer
    val again = pairs(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, m = 8, ksub = 16, rerank = 25))
    assert(pq == again)
  }

  test("bitextMarginPairsAnn: exact scores where the match agrees; mutual-pair recall pinned") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val src = emb.filter(col("label") < 5)
    val tgt = emb.filter(col("label") >= 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(4)))).toMap
    val brute = rows(Similarity.bitextMarginPairs(src, tgt, "vec_id", "embedding"))
    val ann = rows(Similarity.bitextMarginPairsAnn(src, tgt, "vec_id", "embedding",
      dims = 64))
    // exact re-rank: wherever ANN candidates contained brute's true best
    // match, the SCORE is bit-identical (same fused dot, same rounding)
    val agree = ann.filter { case (s, (m, _, _)) => brute.get(s).exists(_._1 == m) }
    assert(agree.nonEmpty, "ANN candidates never contained the true best match")
    agree.foreach { case (s, (_, sc, _)) =>
      assert(sc == brute(s)._2, s"src $s: ANN score $sc != brute ${brute(s)._2}")
    }
    // recall of brute's MUTUAL pairs (the keep set) through the banding —
    // pinned on the deterministic fixture; tune planes/tables up if the
    // corpus changes, never accept a silent drop
    val bruteKeep = brute.collect { case (s, (m, _, true)) => (s, m) }.toSet
    val annKeep = ann.collect { case (s, (m, _, true)) => (s, m) }.toSet
    val recall = (bruteKeep intersect annKeep).size.toDouble / bruteKeep.size
    assert(recall >= 0.4, s"ANN mutual-pair recall dropped to $recall")
    // soundness: every ANN mutual pair is a real pair of the corpora
    assert(annKeep.forall { case (s, m) => s != m })
  }

  test("lshTopK@20 multi-probe recall vs brute on the fixture (the RRF ANN leg)") {
    // sf0.01 (500 vectors): the scale the oracle gate runs the fused
    // queries at — at sf0.001's ~50 vectors a top-20 request is half
    // the corpus and bucket recall is degenerate by construction
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 20))
    val lsh = pairs(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 20, dims = 64, planes = 6))
    val recall = (bf intersect lsh).size.toDouble / bf.size
    // measured 0.1375 on the deterministic fixture and pinned just
    // below: the synthetic embeddings are near-uniform on the sphere
    // (top-20-of-500 cosines ≈ 0.3), so hyperplane collision
    // probability — not the implementation — bounds recall; real
    // clustered embedding spaces sit far above this. The assert exists
    // to catch a silent recall DROP from a code change.
    assert(recall >= 0.13, s"multi-probe LSH recall@20 dropped to $recall")
  }

  test("blocked pairs only form within a block") {
    val out = Similarity.cosinePairsBlocked(vecs, "vec_id", "embedding", "label",
      threshold = -2.0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
  }

  test("lshCosinePairs: near-identical vectors pair without any blocking column") {
    import spark.implicits._
    val dims = 8
    val base = (0 until dims).map(_.toDouble / 10 + 0.1)
    val near = base.updated(0, base.head + 0.01)    // cosine ~ 1
    val far = (0 until dims).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val df = Seq((1L, base), (2L, near), (3L, far))
      .toDF("vec_id", "embedding")
    val pairs = graft.operators.Similarity.lshCosinePairs(
        df, "vec_id", "embedding", threshold = 0.9, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 > 0.99)
    // identical vectors share every table's bucket -> always candidates
    val dup = graft.operators.Similarity.lshCosinePairs(
      Seq((1L, base), (9L, base)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.99, dims = dims)
      .collect()
    assert(dup.length == 1 && dup.head.getDouble(2) == 1.0)
  }

  test("knnGraph: every vector gets ranked bucket-mate neighbors; identicals rank first") {
    import spark.implicits._
    val dims = 8
    val base = (0 until dims).map(_.toDouble / 10 + 0.1)
    val near = base.updated(0, base.head + 0.01)
    val df = Seq((1L, base), (2L, near), (3L, base))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.knnGraph(df, "vec_id", "embedding",
        k = 2, dims = dims)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQuery = out.groupBy(_._1)
    // 1 and 3 are identical: each ranks the other first with score 1.0
    assert(byQuery(1L).head == ((1L, 1, 3L, 1.0)))
    assert(byQuery(3L).head == ((3L, 1, 1L, 1.0)))
    // near vector sees both, ranked deterministically (score, then id)
    assert(byQuery(2L).map(_._3).toSet == Set(1L, 3L))
  }

  test("hammingTopK: sign-identical vector at distance 0, sign-opposite at dims") {
    val out = Similarity.hammingTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getInt(3)))
    // 1, 2 and 4 share 0's sign pattern (all coords ≥ 0, and 0.0 counts
    // as non-negative) → Hamming 0, ordered by id; 3 flips only
    // coordinate 0's sign → distance 1, ranked last
    assert(out.toSeq == Seq((1L, 0), (2L, 0), (4L, 0), (3L, 1)))
  }

  test("sign_pack packs 32 dims per long word, bit i = sign of coord i") {
    import spark.implicits._
    // 33 dims: coord 0 negative, coord 32 positive → word0 has bit 0
    // clear and bits 1..31 set; word1 has bit 0 set
    val emb = (0 until 33).map(i => if (i == 0) -1.0f else 1.0f)
    val out = Seq(Tuple1(emb)).toDF("e")
      .select(graft.plans.SketchExpressions.sign_pack(col("e")).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(out == Seq(0xFFFFFFFEL, 1L))
  }

  test("sign_pack fails loudly on null elements; hamming_dist on width mismatch") {
    import spark.implicits._
    // a null slot must NOT silently read as 0.0 (which would set the
    // sign bit and diverge from the SQL oracle's NULL handling)
    val nullEmb = Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 2.0f))).toDF("e")
    val exN = intercept[Exception] {
      nullEmb.select(graft.plans.SketchExpressions.sign_pack(col("e"))).collect()
    }
    assert(exN.getMessage != null)
    // differing signature widths must throw, not truncate to the shorter
    val packs = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    val exW = intercept[Exception] {
      packs.select(graft.plans.SketchExpressions.hamming_dist(col("a"), col("b"))).collect()
    }
    assert(exW.getMessage != null)
  }

  test("matryoshkaTopK with full-width coarse stage equals brute force") {
    // coarseDims = dims and m ≥ corpus ⇒ the funnel is exhaustive: the
    // two-stage machinery (heap candidates, rerank join) must reproduce
    // bruteForceTopK exactly
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val mat = Similarity.matryoshkaTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, coarseDims = 4, m = 10)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(mat.toSeq == brute.toSeq)
  }

  test("matryoshkaTopK prefix stage prunes: candidates bound the rerank set") {
    // prefix-2 coarse ranking on 4-dim vectors still surfaces the
    // identical vector (its prefix is identical too)
    val out = Similarity.matryoshkaTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 2, coarseDims = 2, m = 3)
      .collect().map(_.getLong(2))
    assert(out.contains(4L))
  }

  test("groupCentroids: exact fixed-point mean, partitioning-independent") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)),   // mean (2.0, 3.0)
      ("b", Seq(0.1, -0.2))                          // mean (0.1, -0.2)
    ).toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Embeddings.groupCentroids(d, "label", "embedding")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    val out = run(df)
    assert(out == Set(("a", 1, 2.0), ("a", 2, 3.0), ("b", 1, 0.1), ("b", 2, -0.2)))
    // exact integer sums: any repartitioning gives the identical result
    assert(run(df.repartition(7)) == out)
  }

  test("kCenterGreedy: farthest-point traversal with id tiebreaks, k beyond pool size") {
    import spark.implicits._
    // 1D line embedded in 2D: 0 at x=0, 1 at x=1, 2 at x=10, 3 at x=10
    // (exact duplicate of 2, higher id). Seed = lowest id (0, d 0);
    // round 2 picks the farthest point (2: d=100; 3 ties but 2 wins on
    // id); round 3 picks 1 (min dist to {0,2}: 1) over 3 (min dist 0)
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(10.0, 0.0)), (3L, Seq(10.0, 0.0))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Embeddings
      .kCenterGreedy(df, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1, 0L, 0.0), (2, 2L, 100.0), (3, 1L, 1.0)))
    // k larger than the pool: selection stops when every point is a
    // center — no crash, no repeats
    val all = graft.operators.Embeddings
      .kCenterGreedy(df, "vec_id", "embedding", k = 10)
      .collect().map(_.getLong(1)).toSeq
    assert(all == Seq(0L, 2L, 1L, 3L))
  }

  test("mmrSelect: diversity term skips the redundant duplicate of the seed") {
    import spark.implicits._
    // a=(1,0) rel 1.0 seeds; b=(1,0) rel 0.8 is a's DUPLICATE:
    // mmr(b) = .7*.8 - .3*1 = 0.26 < mmr(c) = .7*.5 - .3*0 = 0.35,
    // so round 2 picks the orthogonal c despite b's higher relevance;
    // b only enters in round 3. A pure-relevance top-3 would order
    // a, b, c — the diversity term is what reorders it.
    val df = Seq(
      (1L, Seq(1.0, 0.0), 1.0), (2L, Seq(1.0, 0.0), 0.8),
      (3L, Seq(0.0, 1.0), 0.5)
    ).toDF("vec_id", "embedding", "rel")
    val out = graft.operators.Embeddings
      .mmrSelect(df, "vec_id", "embedding", "rel", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(out.map(_._2) == Seq(1L, 3L, 2L))
    assert(out(0)._3 == 0.7 && out(1)._3 == 0.35 && out(2)._3 == 0.26)
    // k beyond pool size: stops cleanly; deterministic across
    // partitionings
    val a = graft.operators.Embeddings
      .mmrSelect(df.repartition(5), "vec_id", "embedding", "rel", k = 10)
      .collect().map(_.toSeq).toSeq
    val b = graft.operators.Embeddings
      .mmrSelect(df.coalesce(1), "vec_id", "embedding", "rel", k = 10)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.size == 3)
  }

  test("topComponentFixedPoint: finds the dominant axis; projections align") {
    import spark.implicits._
    // strong variance along dim 0, tiny noise on dim 1: the dominant
    // direction must concentrate on component 0 and projections must
    // track the dim-0 coordinate's sign and order
    val df = (0L until 40L).map { i =>
      val v = (i.toDouble - 19.5) / 20.0 // symmetric, mean ~0
      (i, Seq(v.toFloat, (0.01 * (i % 3 - 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val (comp, proj) = graft.operators.Embeddings
      .topComponentFixedPoint(df, "vec_id", "embedding", dim = 2)
    // the rescale divides by floor(max|s| / 2^20), so the dominant
    // component lands at 2^20 up to the divisor-floor excess
    assert(math.abs(math.abs(comp(0)) - 1048576L) <= 1024L,
      s"dominant axis normalizes to full scale: $comp")
    assert(math.abs(comp(1)) < 100000L, s"noise axis stays small: $comp")
    val p = proj.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // projections are monotone in the dim-0 coordinate (up to sign)
    val sgn = math.signum(comp(0).toDouble) *
      math.signum(p(39L).toDouble - p(0L).toDouble)
    val ordered = (0L until 39L).forall(i =>
      (p(i + 1) - p(i)) * (p(39L) - p(0L)) >= 0)
    assert(ordered, "projections monotone along the dominant axis")
    assert(sgn != 0.0)
  }

  test("topComponentFixedPoint: shift-invariant (centering) and repartition-deterministic") {
    import spark.implicits._
    val base = (0L until 30L).map { i =>
      (i, Seq(((i % 7).toDouble / 8.0).toFloat, ((i % 5).toDouble / 8.0).toFloat,
        ((i % 3).toDouble / 8.0).toFloat))
    }
    val df = base.toDF("vec_id", "embedding")
    // +0.5 quantizes exactly (524288/2^20), so centering must cancel it
    val shifted = base.map { case (i, e) => (i, e.map(v => v + 0.5f)) }
      .toDF("vec_id", "embedding")
    val (c1, p1) = graft.operators.Embeddings
      .topComponentFixedPoint(df, "vec_id", "embedding", dim = 3)
    val (c2, p2) = graft.operators.Embeddings
      .topComponentFixedPoint(shifted, "vec_id", "embedding", dim = 3)
    assert(c1 == c2, "mean removal cancels an exactly-quantized shift")
    assert(p1.collect().map(_.toSeq).toSet == p2.collect().map(_.toSeq).toSet)
    val (c3, p3) = graft.operators.Embeddings
      .topComponentFixedPoint(df.repartition(7), "vec_id", "embedding", dim = 3)
    assert(c1 == c3)
    assert(p1.collect().map(_.toSeq).toSet == p3.collect().map(_.toSeq).toSet)
  }

  test("bitextMarginPairs: matches, ratio margins, and mutual-best flags") {
    // src 1=(1,0) pairs with tgt 11=(1,0); src 2=(0,1) with 13=(0,1);
    // src 3=(0.6,0.8) is collinear with 12 and MUTUAL with it; src 4
    // =(0.7,0.7) also picks 12 but 12's best src is 3 -> NOT mutual
    val src = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.6, 0.8)), (4L, Seq(0.7, 0.7))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (11L, Seq(1.0, 0.0)), (12L, Seq(0.6, 0.8)), (13L, Seq(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMarginPairs(src, tgt, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L)._1 == 11L && out(1L)._4, "x-axis pair is mutual best")
    assert(out(2L)._1 == 13L && out(2L)._4, "y-axis pair is mutual best")
    assert(out(3L)._1 == 12L && out(3L)._4, "collinear pair is mutual")
    assert(out(4L)._1 == 12L && !out(4L)._4,
      "4's best is 12 but 12's best is 3 -> not mutual")
    assert(math.abs(out(1L)._2 - 1.0) < 1e-9 &&
      math.abs(out(1L)._3 - 1.666667) < 1e-5, "margin = 1.0 / 0.6")
    assert(out.values.forall(_._3 >= 1.0), "best/second-best ratio >= 1")
  }

  test("bitextMarginPairs: deterministic across repartitionings") {
    val vecs = (0L until 40L).map(i => (i,
      Seq(((i * 13 % 17) / 17.0), ((i * 7 % 11) / 11.0), 0.3)))
    val src = vecs.take(20).toDF("vec_id", "embedding")
    val tgt = vecs.drop(20).toDF("vec_id", "embedding")
    val a = Similarity.bitextMarginPairs(src.repartition(5), tgt.repartition(3),
      "vec_id", "embedding").collect().map(_.toSeq).toSet
    val b = Similarity.bitextMarginPairs(src.coalesce(1), tgt.coalesce(1),
      "vec_id", "embedding").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
