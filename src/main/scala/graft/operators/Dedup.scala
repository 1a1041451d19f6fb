package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH and SimHash. (The reference's only dedup is
  * full-row DISTINCT / INSERT-OR-IGNORE — `bin/fetcher.bash:158-159` —
  * generalized here to content-level near-dup detection.)
  *
  * Scale design (100 TB posture):
  *  - Everything is expressed as map-side shingling + hash-partitioned
  *    joins/aggregations — no driver-side materialization, no cartesian
  *    products. Pair generation always goes through an equi-join key
  *    (shared shingle / LSH band / simhash band), so Spark plans a
  *    shuffle hash join, never a nested-loop.
  *  - Frequent-shingle skew (stopword shingles shared by millions of
  *    docs) is the classic blowup: [[jaccardPairs]] takes a
  *    `maxShinglePairs` cap that drops shingles occurring in more docs
  *    than the cap (they contribute little discrimination anyway). AQE's
  *    skew-join splitting handles the residual imbalance.
  *  - MinHash signatures are fixed-width (numHashes longs) per doc:
  *    the candidate join shuffles only (band, bandHash, id) — bytes per
  *    doc, not the document text.
  */
object Dedup {

  /** Exact dedup: one surviving row per distinct key (min id wins —
    * deterministic, order-free). */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles (distinct), empty when fewer than n tokens.
    * Built from sequence/transform/element_at — codegen'd, no UDF. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws("_", (1 to n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** (id, shingle) exploded table + per-doc shingle-set sizes. */
  def shingleTables(df: DataFrame, idCol: String, textCol: String, n: Int = 3)
      : (DataFrame, DataFrame) = {
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    val exploded = withSh.select(col("id"), explode(col("sh")).as("s"))
    val sizes = withSh.select(col("id"), size(col("sh")).as("n_sh"))
    (exploded, sizes)
  }

  /** All-pairs n-gram Jaccard ≥ threshold via inverted index:
    * shared-shingle equi-join → per-pair intersection count → Jaccard
    * against set sizes. `maxDocsPerShingle` drops degenerate hub
    * shingles before the join (skew guard). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, n: Int = 3,
                   maxDocsPerShingle: Int = 1000000): DataFrame = {
    val (exploded, sizes) = shingleTables(df, idCol, textCol, n)
    val pruned =
      if (maxDocsPerShingle == Int.MaxValue) exploded
      else {
        val hot = exploded.groupBy("s").agg(count(lit(1)).as("df_s"))
          .filter(col("df_s") > maxDocsPerShingle).select("s")
        // NB: using-column joins put the key first — reselect explicitly.
        exploded.join(hot, Seq("s"), "left_anti").select("id", "s")
      }
    val a = pruned.select(col("id").as("id_a"), col("s"))
    val b = pruned.select(col("id").as("id_b"), col("s"))
    val inter = a.join(b, "s").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val ja = inter
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
    ja.select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // --- MinHash + LSH ---

  /** Deterministic (a,b) parameters for the i-th hash permutation —
    * splitmix64-style odd multipliers, fixed at build time so
    * signatures are reproducible across runs/sessions. */
  private def hashParams(i: Int): (Long, Long) = {
    val a = ((0x9E3779B97F4A7C15L * (i + 1)) & 0x7FFFFFFFL) | 1L
    val b = (0xBF58476D1CE4E5B9L * (i + 1)) & 0x7FFFFFFFL
    (a, b)
  }
  private val MinhashPrime = 4294967311L // smallest prime > 2^32

  /** 32-bit base hash of a shingle, md5-derived (stable across engines,
    * enabling oracle parity for anything built on it). */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Per-doc MinHash signature: array of `numHashes` minima. One
    * explode + one groupBy — the signature shuffle carries
    * numHashes×8 bytes per doc. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, n: Int = 3): DataFrame = {
    val (exploded, _) = shingleTables(df, idCol, textCol, n)
    val hashed = exploded.withColumn("x", md5Hash32(col("s")))
    val aggs = (0 until numHashes).map { i =>
      val (a, b) = hashParams(i)
      min(pmod(col("x") * a + b, lit(MinhashPrime))).as(s"h$i")
    }
    hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band the signature, hash each band, equi-join
    * docs sharing any (band, bandHash). bands*rowsPerBand must equal
    * numHashes. */
  def lshCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { bIdx =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${bIdx * rowsPerBand + r}"))
      struct(lit(bIdx).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val banded = signatures
      .select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    banded.toDF("id_a", "band", "bh")
      .join(banded.toDF("id_b", "band", "bh"), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates, then exact
    * Jaccard verification of candidates only. With b=32,r=4 the miss
    * probability at j≥0.8 is < 5e-8 per pair, so the verified output
    * matches the all-pairs oracle. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, numHashes: Int = 128,
                   bands: Int = 32, n: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, n)
    val cands = lshCandidates(sigs, bands, numHashes / bands)
    val (exploded, sizes) = shingleTables(df, idCol, textCol, n)
    val a = exploded.toDF("id_a", "s")
    val b = exploded.toDF("id_b", "s")
    val inter = a.join(b, "s").filter(col("id_a") < col("id_b"))
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b")
  }

  // --- SimHash ---

  /** 32-bit SimHash per doc from md5-derived token hashes: per-bit sign
    * sum over token occurrences; bit set iff sum >= 0. 32 conditional
    * aggregates — one groupBy, fully codegen'd. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val hashed = tok.withColumn("hv", md5Hash32(col("tok")))
    val bitAggs = (0 until 32).map { j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val sums = hashed.groupBy(col("id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 32).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found
    * via band join on `bands` equal bit-slices. Pigeonhole: with
    * maxHamming < bands, every qualifying pair shares at least one
    * exact band — recall is GUARANTEED, not probabilistic. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands, "pigeonhole recall needs maxHamming < bands")
    val bits = 32 / bands
    val sims = simhash(df, idCol, textCol)
    val banded = sims.select(col("id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bits).bitwiseAND((1L << bits) - 1).as("bv"))
      }: _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
    banded.toDF("id_a", "sim_a", "band", "bv")
      .join(banded.toDF("id_b", "sim_b", "band", "bv"), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
