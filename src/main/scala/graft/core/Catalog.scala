package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Per-cycle catalog operations (reference: one SQLite DB per group,
  * `bin/fetcher.bash:86-88`, and the catalog-metadata predicate
  * `SELECT name FROM sqlite_schema WHERE type='table' AND name NOT LIKE
  * 'sqlite_%'` at `:130` — F5/S10/D2 in SURVEY.md §2).
  *
  * A "cycle" maps to a Spark SQL database of parquet tables. Overwrite
  * semantics per table reproduce the reference's drop-and-recreate-DB
  * behavior without losing other tables mid-failure (each table swap is
  * atomic at the table level, an improvement worth keeping rather than
  * copying rm -f).
  */
object Catalog {

  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** The reference's user-table listing predicate: all tables of the
    * cycle database, excluding anything engine-internal (the sqlite_
    * NOT LIKE maps to a name-prefix exclusion). */
  def listUserTables(spark: SparkSession, db: String,
                     excludePrefix: String = "_"): Seq[String] =
    spark.catalog.listTables(db).collect()
      .map(_.name)
      .filterNot(_.startsWith(excludePrefix))
      .sorted
      .toSeq

  def save(spark: SparkSession, db: String, table: String, df: DataFrame): Unit = {
    ensureDatabase(spark, db)
    // zstd: ~30% smaller than snappy on text-heavy tables for a small
    // CPU cost — at 100 TB the scan time is IO-bound, so this is a win
    // on both storage and read throughput.
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .saveAsTable(s"`$db`.`$table`")
  }

  /** Bucketed save: pre-partitions (and sorts) the table by the join
    * key so future joins/aggregations on that key are CO-LOCATED —
    * Spark plans a sort-merge join with NO exchange on either side.
    * At 100 TB this converts every fact-to-fact join on the bucket key
    * from a full-table shuffle into a local merge. Bucket count should
    * be sized so a bucket fits an executor's working memory
    * (rows/bucket ≈ table / numBuckets). */
  def saveBucketed(spark: SparkSession, db: String, table: String, df: DataFrame,
                   bucketCols: Seq[String], numBuckets: Int): Unit = {
    ensureDatabase(spark, db)
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(s"`$db`.`$table`")
  }

  /** Date/key-partitioned save: directory-partitioned layout so
    * time-ranged queries prune whole partitions at planning time (the
    * Spark-native version of the reference's year-based temporal
    * pruning, F6 — at 100 TB a day-partitioned events table turns a
    * month query into 30 directory reads). */
  def savePartitioned(spark: SparkSession, db: String, table: String,
                      df: DataFrame, partitionCols: Seq[String]): Unit = {
    ensureDatabase(spark, db)
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .saveAsTable(s"`$db`.`$table`")
  }

  /** Upsert a slice of a partitioned table: with dynamic partition
    * overwrite, only the partitions PRESENT in `slice` are replaced —
    * the incremental-cycle refinement of the reference's
    * drop-everything D2 semantics. */
  def overwritePartitions(spark: SparkSession, db: String, table: String,
                          slice: DataFrame): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try slice.write.mode(SaveMode.Overwrite)
      .insertInto(s"`$db`.`$table`")
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** Drop-and-recreate a whole cycle database (D2). */
  def resetDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    ensureDatabase(spark, db)
  }

  /** Create-or-replace a database rooted at a FRESH temp directory — for
    * scratch tables written inside repeatable query runs. The default
    * warehouse keeps table FILES across JVM exits while the in-memory
    * catalog forgets the metadata, so a re-run's `saveAsTable` would die
    * with LOCATION_ALREADY_EXISTS; a fresh location per call sidesteps
    * that without touching the caller's warehouse. */
  def scratchDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val loc = java.nio.file.Files.createTempDirectory(s"graft_scratch_$db")
    spark.sql(s"CREATE DATABASE `$db` LOCATION '${loc.toUri}'")
  }

  /** JDBC sink — the reference's stated end goal is "prepping for
    * postgres" (`README.md:1`); this is the hand-off. Each partition
    * opens one connection and writes `batchSize`-row batches, so
    * parallelism = partition count — repartition the frame to the
    * number of concurrent connections the target DB tolerates.
    * `overwrite = true` with `truncate` keeps the table's DDL (indexes,
    * grants) and truncates instead of drop-and-recreate. */
  def saveJdbc(df: DataFrame, url: String, table: String,
               properties: java.util.Properties = new java.util.Properties,
               overwrite: Boolean = false, truncate: Boolean = true,
               batchSize: Int = 10000, numPartitions: Option[Int] = None): Unit = {
    val sized = numPartitions.map(df.repartition(_)).getOrElse(df)
    sized.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .option("truncate", truncate.toString)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, properties)
  }

  /** Crash-safe staged swap: replace `target` with `staging` without a
    * window in which neither exists. The naive delete-then-rename
    * protocol loses the table if the process dies between the two ops
    * (and a checkpointed streaming replay that then sees
    * `exists(target) == false` would rebuild from the batch alone,
    * silently dropping every previously merged key). Protocol here:
    * rename target→target.bak, rename staging→target, delete bak —
    * at every instant either target or a completed predecessor
    * (bak / staging-with-_SUCCESS) exists, and [[recoverSwap]] can
    * finish or roll back an interrupted swap on the next entry. */
  private[graft] def swapInto(fs: org.apache.hadoop.fs.FileSystem,
                              staging: org.apache.hadoop.fs.Path,
                              target: org.apache.hadoop.fs.Path): Unit = {
    val bak = new org.apache.hadoop.fs.Path(target.toString + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(target) && !fs.rename(target, bak))
      sys.error(s"swap: could not move $target aside to $bak")
    if (!fs.rename(staging, target)) {
      if (fs.exists(bak)) fs.rename(bak, target) // roll back
      sys.error(s"swap: could not rename $staging to $target")
    }
    fs.delete(bak, true)
    ()
  }

  /** Recover a table left mid-swap by a crash, before reading it.
    * If `target` is missing: a staging dir with a `_SUCCESS` marker is
    * a fully written successor (the crash hit between the bak-rename
    * and the staging-rename) — promote it; otherwise restore the bak.
    * If `target` exists, any leftover bak is an orphan from a crash
    * after the swap completed — drop it. Idempotent. */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                                 target: org.apache.hadoop.fs.Path,
                                 staging: org.apache.hadoop.fs.Path): Unit = {
    val bak = new org.apache.hadoop.fs.Path(target.toString + ".bak")
    if (!fs.exists(target)) {
      val stagingComplete = fs.exists(staging) &&
        fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))
      if (stagingComplete) { fs.rename(staging, target); fs.delete(bak, true) }
      else if (fs.exists(bak)) fs.rename(bak, target)
    } else if (fs.exists(bak)) fs.delete(bak, true)
    ()
  }

  /** Small-file compaction for a parquet directory: incremental sinks
    * (per-cycle appends, streaming upserts, dynamic partition
    * overwrites) accumulate files far below the ~128-256 MB a scan
    * wants, and at 100 TB the resulting task-per-tiny-file overhead
    * and NameNode/listing pressure dominate. Rewrites the directory to
    * ceil(bytes / targetFileBytes) files via `coalesce` (a NARROW
    * repartitioning — no shuffle; skipped entirely if the file count
    * is already at or below the target), staged and swapped via the
    * crash-safe [[swapInto]] protocol (an interrupted run is repaired
    * by [[recoverSwap]] on the next one). Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 256L * 1024 * 1024): (Int, Int) = {
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + ".compacting")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, target, staging)
    val dataFiles = fs.listStatus(target)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (dataFiles.length <= want) (dataFiles.length, dataFiles.length)
    else {
      spark.read.parquet(path).coalesce(want)
        .write.mode(SaveMode.Overwrite).parquet(staging.toString)
      swapInto(fs, staging, target)
      val after = fs.listStatus(target)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      (dataFiles.length, after)
    }
  }

  /** Z-ORDERED write: the Delta/Iceberg `OPTIMIZE ZORDER` layout trick
    * on plain parquet — interleave the low bits of two dimension
    * columns ([[graft.plans.LayoutExpressions.zorder_key]]), range-
    * partition on the key and sort within partitions, so every output
    * file spans a narrow RECTANGLE of both dimensions. Parquet's
    * ordinary column min/max stats then skip files on a predicate over
    * EITHER column, with no new reader and no table format. `nFiles`
    * sizes the layout (one range partition = one file); the key column
    * is dropped before write — it exists to ORDER the data, not to be
    * stored. The range exchange is the only shuffle and is exactly the
    * shuffle any global layout requires. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, nFiles: Int = 64): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__zkey",
        graft.plans.LayoutExpressions.zorder_key(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Token-balanced TRAINING SHARDS: materialize a corpus as
    * `shard=<s>/bin_idx=<b>` parquet directories where each bin holds
    * ~`budget` tokens (contiguous fill per shard —
    * [[graft.operators.Packing.packBins]]'s deterministic assignment,
    * so bin membership is reproducible across runs/engines, never
    * arrival order). One repartition on the exact (shard, bin) key
    * puts each bin wholly in one task → one file per bin; dataloaders
    * then stream whole bins as ~equal-sized work units. Bin token
    * sums land within ±(max single-doc tokens) of `budget` except
    * each shard's ragged tail — the property LayoutWriterSpec pins. */
  def writeTokenShards(df: DataFrame, tokenCol: String, idCol: String,
                       budget: Long, path: String, shards: Int = 64): Unit = {
    import org.apache.spark.sql.functions.col
    graft.operators.Packing.packBins(df, idCol, tokenCol, budget, shards)
      .drop("start_offset")
      .repartition(col("shard"), col("bin_idx"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard", "bin_idx").parquet(path)
  }

  /** JDBC source, partition-parallel when a numeric split column is
    * given (each partition issues a bounded-range query). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               properties: java.util.Properties = new java.util.Properties,
               partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionColumn match {
      case Some((col, lo, hi, n)) =>
        spark.read.jdbc(url, table, col, lo, hi, n, properties)
      case None => spark.read.jdbc(url, table, properties)
    }
}
