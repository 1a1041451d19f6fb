package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot management: content-hash diffs between two corpus
  * versions — the bookkeeping a recurring ingestion pipeline needs to
  * process only what moved (re-embed changed docs, tombstone removed
  * ones, dedup-check added ones) instead of re-running every stage over
  * the full corpus each cycle. The reference's sync stage has the same
  * economics at the FILE level (`aws s3 sync` transfers only changed
  * objects, `bin/fetcher.bash:51`); this is the row-level analogue a
  * Spark-native pipeline wants.
  *
  * Scale shape: one shuffle per side on the key (the join), and the
  * comparison payload is a fixed 128-bit md5 per row no matter how wide
  * the content columns are — a 100 TB corpus diffs by moving ~16 B/row
  * plus the key. When both snapshots are maintained as bucketed tables
  * on the key ([[graft.core.Catalog.saveBucketed]]), the join plans
  * with ZERO exchange. Emitting only the non-`unchanged` rows keeps the
  * output proportional to the churn, not the corpus.
  */
object Delta {

  /** Row-level diff of two snapshots keyed by `keyCol`: one row per key
    * present in either side, with `status` ∈ added | removed | changed |
    * unchanged. Content is compared as one md5 over `contentCols`, each
    * field emitted as a null-indicator ('n' | 'v') plus the
    * NULL-coalesced value, all joined with U+0001: the indicator keeps
    * NULL distinguishable from the empty string, and coalescing means
    * `concat_ws` (which silently SKIPS null arguments) can never
    * collapse two column boundaries into one — without it,
    * (NULL, "x") and ("x", NULL) would both hash as "x" and a real
    * change would report `unchanged`. Keys must be unique per side —
    * this is a snapshot diff, not a bag diff (duplicate keys would make
    * "changed" ill-defined; use [[Dedup.exact]] upstream if a snapshot
    * can carry duplicates). */
  def snapshotDelta(oldSnap: DataFrame, newSnap: DataFrame,
                    keyCol: String, contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def hashed(df: DataFrame, as: String) = df.select(
      col(keyCol),
      md5(concat_ws("\u0001", contentCols.flatMap(c => Seq(
        when(col(c).isNull, lit("n")).otherwise(lit("v")),
        coalesce(col(c).cast("string"), lit("")))): _*))
        .as(as))
    val o = hashed(oldSnap, "old_hash")
    val n = hashed(newSnap, "new_hash")
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** [[snapshotDelta]] restricted to the churn — the added / removed /
    * changed keys a downstream incremental stage actually consumes. */
  def churn(oldSnap: DataFrame, newSnap: DataFrame,
            keyCol: String, contentCols: Seq[String]): DataFrame =
    snapshotDelta(oldSnap, newSnap, keyCol, contentCols)
      .filter(col("status") =!= "unchanged")
}
