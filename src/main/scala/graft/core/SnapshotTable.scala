package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-committed table format over plain parquet — the
  * transactional completion of the incremental cycle that
  * [[graft.streaming.EventStreams.upsertSink]]'s staging-swap protocol
  * deliberately stopped short of (its scaladoc named this format as
  * the cue at fact scale). The reference's whole economics is
  * versioned incremental cycles (FetchVersions,
  * `bin/fetcher.bash:25-35`; S3 `list-object-versions`); this is the
  * row-level version of the same idea, without adopting Delta/Iceberg.
  *
  * Layout under one root directory:
  * {{{
  *   <root>/data/<commit-nonce>/part-*.parquet   immutable once published
  *   <root>/_manifests/v%09d.manifest            one data-file entry per line
  *   <root>/_staging/...                         in-flight writes (orphaned by a crash)
  * }}}
  *
  * A manifest ENTRY is the file's root-relative path, optionally
  * followed by TAB + per-column min/max stats (`col=min:max`,
  * comma-joined, recorded when the committer passed `statsCols`):
  * Iceberg's file-pruning idea on one line of text. [[scanPruned]]
  * keeps only the files whose recorded range intersects the
  * predicate's — at 100 TB with range-clustered commits (writers
  * `repartitionByRange` on the stats column; [[Catalog.writeZOrdered]]
  * for two), a key-range query plans against the handful of files
  * that can match instead of the whole snapshot, before Spark even
  * plans the scan. Entries without stats (older manifests, columns
  * not recorded) are always kept — pruning is strictly a superset
  * guarantee, never a correctness gate.
  *
  * THE COMMIT PROTOCOL — why a reader can never see a torn table:
  *  1. data files are written to a fresh nonce'd directory under
  *     `data/` that NO manifest references yet; readers cannot reach
  *     them.
  *  2. the manifest (the full file list of the new snapshot) is
  *     written to a temp name and PUBLISHED by one atomic rename to
  *     `v<N+1>.manifest`. Readers resolve the table as "highest
  *     committed manifest", so at every instant they see either
  *     snapshot N or snapshot N+1, both complete.
  *  3. a crash anywhere before the rename leaves orphan data files and
  *     a temp manifest — invisible to every reader, reclaimed by
  *     [[vacuum]]. There is nothing to repair on restart (contrast the
  *     swap protocol's recoverSwap), because no destructive step ever
  *     happens: old files are only deleted by an explicit vacuum that
  *     keeps the last `keepVersions` snapshots readable.
  *
  * READ-UNDER-COMMIT ISOLATION: [[read]] pins the manifest's file list
  * at call time; data files are immutable and survive later commits
  * (until vacuumed), so a reader planned against snapshot N returns
  * exactly snapshot N even if commits N+1..N+k land mid-query — the
  * property the upsert sink's staging swap could not give a concurrent
  * reader. [[readVersion]] is the same pin at an explicit version
  * (time travel across the retained window).
  *
  * CONCURRENCY: version numbers linearize committers. POSIX rename
  * over an existing path silently replaces it (last-wins), so after
  * renaming the committer READS BACK the published manifest and
  * compares content — a mismatch means another committer took the same
  * version number, and this commit retries at the next one (bounded
  * retries, then a loud error). Single-writer-per-table remains the
  * designed mode; the verify-retry exists so a misconfigured second
  * writer degrades to serialized commits instead of silent loss. Named
  * limit: the retry linearizes version NUMBERS, not read-merge-commit
  * CYCLES — [[upsertCycle]]/[[compactSnapshot]] read the current
  * snapshot before committing, so two concurrent cyclers can still
  * lose the earlier merge (the classic lost update). No manifest is
  * ever torn by this; rows are. One writer per table is the contract,
  * not an optimization.
  *
  * 100 TB posture: a commit writes only its own data files plus one
  * manifest rename — no table-sized rewrite is required by the FORMAT
  * ([[append]] reuses every prior file; [[commit]] rewrites because a
  * merge-upsert semantically replaces the table). Manifests are one
  * line per file: at 256 MB target files, a 100 TB snapshot is a
  * ~400k-line (~30 MB) manifest — listed once per read plan, never
  * per row. File-count hygiene stays [[Catalog.compact]]'s job,
  * applied before commit, not after. */
object SnapshotTable {

  private val ManifestDir = "_manifests"
  private val StagingDir = "_staging"
  private val DataDir = "data"
  private val ManifestRe = """v(\d{9})\.manifest""".r
  private val MaxCommitRetries = 5

  /** Per-file distinct-value cap for `categoryCols`: a file whose
    * column exceeds it records NO category section (never pruned) —
    * category stats are for LOW-cardinality slice columns (lang,
    * source, split), where a file clustered by the column holds a
    * handful of values. */
  val CategoryCap = 16

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(root: Path, v: Long): Path =
    new Path(new Path(root, ManifestDir), f"v$v%09d.manifest")

  /** Highest committed snapshot version, or None for an empty/new
    * table. Temp manifests (un-renamed) never match the pattern, so a
    * crash mid-commit is invisible here by construction. */
  def currentVersion(fs: FileSystem, root: Path): Option[Long] = {
    val md = new Path(root, ManifestDir)
    if (!fs.exists(md)) return None
    val vs = fs.listStatus(md).iterator.flatMap { st =>
      st.getPath.getName match {
        case ManifestRe(d) => Some(d.toLong)
        case _ => None
      }
    }.toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** All committed versions, ascending — the retained time-travel
    * window (vacuum trims the front). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, rootP) = fsOf(spark, root)
    val md = new Path(rootP, ManifestDir)
    if (!fs.exists(md)) return Nil
    fs.listStatus(md).iterator.flatMap { st =>
      st.getPath.getName match {
        case ManifestRe(d) => Some(d.toLong)
        case _ => None
      }
    }.toSeq.sorted
  }

  /** A manifest entry's root-relative file path (the part before the
    * optional TAB-separated stats). */
  private def entryPath(line: String): String = {
    val t = line.indexOf('\t')
    if (t < 0) line else line.substring(0, t)
  }

  /** A manifest entry's recorded per-column (min, max) long stats —
    * empty for entries written without `statsCols`. An empty bound
    * (all-null column in that file) parses as None = unbounded.
    * Category sections (`col#…`) are skipped here. */
  private[core] def entryStats(line: String)
      : Map[String, (Option[Long], Option[Long])] = {
    val t = line.indexOf('\t')
    if (t < 0) return Map.empty
    line.substring(t + 1).split(',').iterator
      .filter(kv => kv.nonEmpty && kv.contains('=') && !kv.contains('#'))
      .map { kv =>
        val eq = kv.indexOf('=')
        val Array(lo, hi) = kv.substring(eq + 1).split(":", -1)
        kv.substring(0, eq) -> (
          (if (lo.isEmpty) None else Some(lo.toLong)),
          (if (hi.isEmpty) None else Some(hi.toLong)))
      }.toMap
  }

  /** A manifest entry's recorded per-column CATEGORY sets (`col#v1|v2`,
    * values URL-encoded at write) — the categorical twin of
    * [[entryStats]], recorded when the committer passed
    * `categoryCols` and the file's distinct count fit the cap. */
  private[core] def entryCategories(line: String): Map[String, Set[String]] = {
    val t = line.indexOf('\t')
    if (t < 0) return Map.empty
    line.substring(t + 1).split(',').iterator
      .filter(kv => kv.nonEmpty && kv.contains('#'))
      .map { kv =>
        val h = kv.indexOf('#')
        kv.substring(0, h) -> kv.substring(h + 1).split('|').iterator
          .filter(_.nonEmpty)
          .map(java.net.URLDecoder.decode(_, "UTF-8")).toSet
      }.toMap
  }

  private def readManifest(fs: FileSystem, root: Path, v: Long): Seq[String] = {
    val in = fs.open(manifestPath(root, v))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    } finally in.close()
  }

  /** The current snapshot, file list PINNED at call time — later
    * commits do not change what this DataFrame reads. Loud on an
    * uncommitted table (an empty read would silently launder a
    * mid-commit crash into "no data"). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot — nothing was " +
        "ever published (a crash mid-first-commit leaves no manifest by design)"))
    readVersion(spark, root, v)
  }

  /** Snapshot `v` exactly — time travel within the retained window.
    * Loud if `v` was vacuumed or never committed. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    if (!fs.exists(manifestPath(rootP, v)))
      throw new IllegalStateException(
        s"SnapshotTable at $root has no committed manifest v$v " +
          "(never committed, or vacuumed past)")
    val files = readManifest(fs, rootP, v)
    if (files.isEmpty)
      // unreachable by construction: even an empty-DataFrame commit
      // publishes a schema-only part file (publish() requires it), so
      // a fileless manifest can only mean external tampering
      throw new IllegalStateException(
        s"SnapshotTable at $root: manifest v$v lists no files")
    spark.read.parquet(files.map(f => new Path(rootP, entryPath(f)).toString): _*)
  }

  /** Write `df`'s parquet files under a fresh unreferenced data
    * directory and return their manifest entries (root-relative path,
    * plus recorded per-file min/max when `statsCols` is non-empty —
    * ONE extra aggregation job over the just-written files, new data
    * only, never the table). Stats are LONG-typed (`cast("long")`):
    * ids, counts, epoch timestamps — the range-pruning cases; a
    * non-castable column records null bounds and the file is simply
    * never pruned on it. The nonce keeps concurrent committers (and a
    * crash-then-retry) from colliding on a directory name. */
  private def writeDataFiles(spark: SparkSession, fs: FileSystem,
                             rootP: Path, df: DataFrame,
                             statsCols: Seq[String],
                             categoryCols: Seq[String] = Nil): Seq[String] = {
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val staging = new Path(new Path(rootP, StagingDir), nonce)
    df.write.mode("overwrite").option("compression", "zstd")
      .parquet(staging.toString)
    val dataHome = new Path(new Path(rootP, DataDir), nonce)
    fs.mkdirs(dataHome.getParent)
    if (!fs.rename(staging, dataHome))
      sys.error(s"SnapshotTable: could not move staged data $staging " +
        s"into place at $dataHome")
    val rels = fs.listStatus(dataHome)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$DataDir/$nonce/${st.getPath.getName}")
      .sorted.toSeq
    if (statsCols.isEmpty && categoryCols.isEmpty) rels
    else {
      // the stats suffix is a text format (TAB, ',', '=', ':', '#' and
      // '|' are structural) — refuse names that would corrupt it rather
      // than write an unparseable manifest; category VALUES are
      // URL-encoded, so they carry anything
      (statsCols ++ categoryCols).foreach(c => require(
        c.matches("[A-Za-z0-9_]+"),
        s"SnapshotTable stats/category column name '$c' is not " +
          "[A-Za-z0-9_]+ — rename or alias before recording stats"))
      import org.apache.spark.sql.functions._
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"__mn_$c"),
        max(col(c).cast("long")).as(s"__mx_$c"))) ++
        categoryCols.map(c =>
          sort_array(collect_set(col(c).cast("string"))).as(s"__cat_$c"))
      val byBase = spark.read.parquet(dataHome.toString)
        .groupBy(input_file_name().as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => new Path(r.getString(0)).getName -> r).toMap
      val catBase = 1 + 2 * statsCols.size
      rels.map { rel =>
        byBase.get(rel.split('/').last) match {
          case Some(r) =>
            val ranges = statsCols.zipWithIndex.map { case (c, i) =>
              val mn = if (r.isNullAt(1 + 2 * i)) "" else r.getLong(1 + 2 * i).toString
              val mx = if (r.isNullAt(2 + 2 * i)) "" else r.getLong(2 + 2 * i).toString
              s"$c=$mn:$mx"
            }
            val cats = categoryCols.zipWithIndex.flatMap { case (c, j) =>
              val vs = r.getSeq[String](catBase + j)
              // over-cap: record nothing — the file is never pruned on
              // this column (superset contract); an EMPTY set (all-null
              // file) records `c#`, which equality-prunes everything —
              // a null never equals the probe value
              if (vs.size > CategoryCap) None
              else Some(s"$c#" + vs.map(
                java.net.URLEncoder.encode(_, "UTF-8")).mkString("|"))
            }
            val s = (ranges ++ cats).mkString(",")
            if (s.isEmpty) rel else s"$rel\t$s"
          // a zero-row part file groups to no row: no stats, never pruned
          case None => rel
        }
      }
    }
  }

  /** Publish `lines` as the next manifest. Returns the committed
    * version. Retries on a lost version race (see the CONCURRENCY
    * note above). */
  private def publish(fs: FileSystem, rootP: Path, lines: Seq[String])
      : Long = {
    // an EMPTY DataFrame still commits: Spark writes a zero-row
    // part file carrying the schema, so the manifest is never
    // fileless (a schema-only snapshot is a legal table state); a
    // genuinely fileless manifest would mean a writer bug upstream
    require(lines.nonEmpty,
      "SnapshotTable: refusing to publish a fileless manifest — even " +
        "an empty snapshot carries a schema-only part file")
    val body = lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val next = currentVersion(fs, rootP).getOrElse(0L) + 1
      val tmp = new Path(new Path(rootP, ManifestDir),
        s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      fs.mkdirs(tmp.getParent)
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      val target = manifestPath(rootP, next)
      if (fs.rename(tmp, target)) {
        // POSIX rename REPLACES an existing target silently, so verify
        // the published content is ours; losing this check would let
        // two committers share a version number with one silently gone
        val back = readManifest(fs, rootP, next)
        if (back == lines) return next
      } else fs.delete(tmp, false)
      attempt += 1
    }
    sys.error(s"SnapshotTable: lost the commit race $MaxCommitRetries " +
      s"times at $rootP — a second writer is live; serialize committers")
  }

  /** Commit `df` as the next FULL snapshot (replace semantics — the
    * shape a merge-upsert cycle produces). `statsCols` records
    * per-file long min/max in the manifest for [[scanPruned]].
    * Returns the new version. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
             statsCols: Seq[String] = Nil,
             categoryCols: Seq[String] = Nil): Long = {
    val (fs, rootP) = fsOf(spark, root)
    publish(fs, rootP,
      writeDataFiles(spark, fs, rootP, df, statsCols, categoryCols))
  }

  /** Commit `df` as an APPEND snapshot: the new manifest lists every
    * entry of the current snapshot (prior stats preserved verbatim)
    * plus `df`'s new files — no data is rewritten, the format's
    * append is manifest-only. The appended frame's columns must match
    * the current snapshot's (checked LOUDLY): one manifest mixing
    * file schemas would make reads silently drop or misalign columns
    * depending on which file Spark samples first — schema changes go
    * through a full [[commit]] (replace), never an append. Returns
    * the new version. */
  def append(spark: SparkSession, root: String, df: DataFrame,
             statsCols: Seq[String] = Nil,
             categoryCols: Seq[String] = Nil): Long = {
    val (fs, rootP) = fsOf(spark, root)
    val cur = currentVersion(fs, rootP)
    cur.foreach { v =>
      val have = readVersion(spark, root, v).columns.sorted
      require(have.sameElements(df.columns.sorted),
        s"SnapshotTable.append: schema mismatch — snapshot v$v has " +
          s"(${have.mkString(",")}) but the appended frame has " +
          s"(${df.columns.sorted.mkString(",")}); a mixed-schema " +
          "manifest reads nondeterministically, so evolve the schema " +
          "with a full commit instead")
    }
    val prior = cur.map(readManifest(fs, rootP, _)).getOrElse(Nil)
    publish(fs, rootP,
      prior ++ writeDataFiles(spark, fs, rootP, df, statsCols, categoryCols))
  }

  /** The current snapshot restricted to files whose recorded
    * `[min, max]` for `colName` intersects `[lo, hi]` (both
    * inclusive) — manifest-level file pruning, resolved BEFORE Spark
    * plans any scan. Strictly a SUPERSET of the matching rows:
    * entries without stats for the column are always kept, so callers
    * still apply the real row filter; what pruning buys is never
    * opening the files that cannot match. Use [[pruneCounts]] for the
    * (total, kept) file accounting, and [[scanPrunedEq]] for the
    * categorical (equality) twin. */
  def scanPruned(spark: SparkSession, root: String, colName: String,
                 lo: Long, hi: Long): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val kept = prunedEntries(readManifest(fs, rootP, v), colName, lo, hi)
    if (kept.isEmpty)
      // all files pruned: an empty result with the right schema —
      // read one file's schema via the full version, filtered to false
      return readVersion(spark, root, v).limit(0)
    spark.read.parquet(kept.map(f => new Path(rootP, entryPath(f)).toString): _*)
  }

  /** (total files, files kept) for a [[scanPruned]] predicate on the
    * current snapshot — the observability half of pruning. */
  def pruneCounts(spark: SparkSession, root: String, colName: String,
                  lo: Long, hi: Long): (Int, Int) = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val all = readManifest(fs, rootP, v)
    (all.size, prunedEntries(all, colName, lo, hi).size)
  }

  private def prunedEntries(entries: Seq[String], colName: String,
                            lo: Long, hi: Long): Seq[String] =
    entries.filter { e =>
      entryStats(e).get(colName) match {
        // intersect with missing bounds treated as unbounded (an
        // all-null file keeps conservatively; its rows cannot satisfy
        // a range predicate, so the caller's filter drops them)
        case Some((mn, mx)) => mx.forall(_ >= lo) && mn.forall(_ <= hi)
        case None => true // no stats recorded: never prune
      }
    }

  /** The current snapshot restricted to files whose recorded CATEGORY
    * set for `colName` contains `value` — equality pruning for
    * low-cardinality slice columns (lang, source, split), the single
    * most common 100 TB access pattern ("read only lang=en"). Same
    * superset contract as [[scanPruned]]: entries without a category
    * section for the column are always kept, callers still apply the
    * row filter. Record the sections by committing with
    * `categoryCols` after clustering on the column (`repartition` on
    * it puts each value wholly in a few files). */
  def scanPrunedEq(spark: SparkSession, root: String, colName: String,
                   value: String): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val kept = prunedEntriesEq(readManifest(fs, rootP, v), colName, value)
    if (kept.isEmpty) return readVersion(spark, root, v).limit(0)
    spark.read.parquet(kept.map(f => new Path(rootP, entryPath(f)).toString): _*)
  }

  /** (total files, files kept) for a [[scanPrunedEq]] probe. */
  def pruneCountsEq(spark: SparkSession, root: String, colName: String,
                    value: String): (Int, Int) = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val all = readManifest(fs, rootP, v)
    (all.size, prunedEntriesEq(all, colName, value).size)
  }

  private def prunedEntriesEq(entries: Seq[String], colName: String,
                              value: String): Seq[String] =
    entries.filter { e =>
      entryCategories(e).get(colName) match {
        case Some(vs) => vs.contains(value)
        case None => true // no category recorded: never prune
      }
    }

  /** One incremental upsert cycle against the snapshot table —
    * [[graft.streaming.EventStreams.upsertBatch]]'s semantics
    * (last-writer-wins per key across cycles, deterministic
    * first-writer-wins by `tieBreak` within a cycle) on the
    * snapshot-committed layout: merge the batch with the CURRENT
    * snapshot, commit the merge as the next version. Idempotent in
    * content: re-delivering a cycle (foreachBatch's at-least-once
    * crash replay) publishes a new version with IDENTICAL rows.
    * Concurrent readers keep their pinned snapshot throughout. */
  def upsertCycle(batch: DataFrame, root: String, keys: Seq[String],
                  tieBreak: Seq[org.apache.spark.sql.Column] = Nil,
                  statsCols: Seq[String] = Nil): Long = {
    val spark = batch.sparkSession
    val (fs, rootP) = fsOf(spark, root)
    val merged = currentVersion(fs, rootP) match {
      case Some(v) =>
        graft.operators.Components.mergeFirstWriterWins(
          Seq(batch, readVersion(spark, root, v)), keys, tieBreak)
      case None => batch
    }
    commit(spark, root, merged, statsCols)
  }

  /** Streaming upsert sink on the snapshot layout — the production
    * scale path [[graft.streaming.EventStreams.upsertSink]]'s scaladoc
    * pointed at: same foreachBatch merge semantics, but each
    * micro-batch COMMITS a snapshot instead of swapping the table
    * directory, so concurrent readers are isolated and history is
    * queryable until vacuumed. */
  def upsertSink(stream: DataFrame, root: String, checkpoint: String,
                 keys: Seq[String],
                 tieBreak: Seq[org.apache.spark.sql.Column] = Nil,
                 statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertCycle(batch, root, keys, tieBreak, statsCols)
        ()
      }
      .start()

  /** Z-ORDERED commit: [[Catalog.writeZOrdered]]'s layout trick
    * composed with the snapshot format — interleave `colA`/`colB`
    * low bits into a range-partition key so every data file spans a
    * narrow RECTANGLE of both dimensions, then commit with min/max
    * stats recorded for BOTH columns. [[scanPruned]] on EITHER
    * column then skips most files (the two-dimensional pruning
    * Iceberg gets from OPTIMIZE ZORDER), and parquet's own row-group
    * stats prune further inside the kept files. One range exchange —
    * exactly the shuffle any global layout costs. */
  def commitZOrdered(spark: SparkSession, root: String, df: DataFrame,
                     colA: String, colB: String, nFiles: Int = 64): Long = {
    import org.apache.spark.sql.functions.col
    val laid = df.withColumn("__zkey",
        graft.plans.LayoutExpressions.zorder_key(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
    commit(spark, root, laid, statsCols = Seq(colA, colB))
  }

  /** Small-file compaction AS A COMMIT: rewrite the current snapshot
    * into ceil(bytes / targetFileBytes) files (coalesce — a NARROW
    * repartitioning, no shuffle) and publish the rewrite as the next
    * version. [[Catalog.compact]]'s directory-swap version of this
    * must block concurrent readers; here compaction is just another
    * snapshot — readers pinned on the fragmented version finish
    * unaffected, and vacuum reclaims it once it leaves the retained
    * window. No-op (returns None) when the file count is already at
    * or below the target. Incremental sinks NEED this: every
    * upsert/append cycle adds files, and at 100 TB the
    * task-per-tiny-file overhead dominates scans. `statsCols` re-
    * records pruning stats for the compacted layout (coalesce
    * preserves row order per partition, but merged files span wider
    * ranges — re-recording keeps [[scanPruned]] honest). */
  def compactSnapshot(spark: SparkSession, root: String,
                      targetFileBytes: Long = 256L * 1024 * 1024,
                      statsCols: Seq[String] = Nil): Option[Long] = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot to compact"))
    val entries = readManifest(fs, rootP, v)
    val paths = entries.map(e => new Path(rootP, entryPath(e)))
    val totalBytes = paths.map(p => fs.getFileStatus(p).getLen).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (entries.size <= want) None
    else Some(commit(spark, root,
      readVersion(spark, root, v).coalesce(want), statsCols))
  }

  /** Row-level CHANGELOG between two committed snapshots — the "what
    * did cycle N change" question every incremental consumer asks
    * (re-embed only updated docs, retract deleted ones downstream),
    * answered from the retained manifests without any stored delta:
    * one row per key whose state differs between `vFrom` and `vTo`,
    * `change ∈ insert | update | delete`, carrying the NEW column
    * values for insert/update and the LAST-SEEN values for delete.
    * Keys present in both versions with identical non-key columns emit
    * nothing. Key columns must be non-null (the upsert path's merge
    * keys already are); equality is null-safe per column via the
    * struct comparison.
    *
    * Scale shape: ONE full-outer sort-merge join of the two snapshots
    * keyed on `keys` — both sides shuffle once on the key, nothing
    * else moves; the per-row struct compare is codegen'd. At 100 TB
    * this is the honest price of a keyed diff with no stored change
    * log; consumers that need cheaper deltas should diff adjacent
    * versions (small merges) rather than distant ones. */
  def diff(spark: SparkSession, root: String, vFrom: Long, vTo: Long,
           keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readVersion(spark, root, vFrom)
    val b = readVersion(spark, root, vTo)
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"SnapshotTable.diff: schema changed between v$vFrom " +
        s"(${a.columns.sorted.mkString(",")}) and v$vTo " +
        s"(${b.columns.sorted.mkString(",")}) — diff a compatible pair " +
        "or migrate first")
    val nonKeys = b.columns.filterNot(keys.contains).toSeq
    val aSide = a.select((keys.map(col) :+ lit(true).as("__a")) ++
      nonKeys.map(c => col(c).as(s"__a_$c")): _*)
    val bSide = b.select((keys.map(col) :+ lit(true).as("__b")) ++
      nonKeys.map(c => col(c).as(s"__b_$c")): _*)
    val same = nonKeys.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    aSide.join(bSide, keys, "full_outer")
      .withColumn("change",
        when(col("__a").isNull, lit("insert"))
          .when(col("__b").isNull, lit("delete"))
          .when(same, lit(null).cast("string"))
          .otherwise(lit("update")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change")) ++ nonKeys.map(c =>
        when(col("change") === "delete", col(s"__a_$c"))
          .otherwise(col(s"__b_$c")).as(c)): _*)
  }

  /** Every row-level change AFTER `sinceVersion` up to the current
    * snapshot — the incremental-consumer API over [[diff]]: a
    * downstream job records the last version it processed and calls
    * this to catch up, getting the concatenated per-step diffs with a
    * `version` column naming the commit that introduced each change
    * (so a key updated twice appears twice, in order — a CHANGELOG,
    * not a net diff; consumers wanting the net state of changed keys
    * take the max-version row per key, or call [[diff]] directly).
    * Loud when `sinceVersion` left the retained window — a consumer
    * that fell behind vacuum must re-bootstrap from a full [[read]],
    * never silently miss changes. Scale: one keyed full-outer join
    * per RETAINED step — the retention horizon bounds the work. */
  def changesSince(spark: SparkSession, root: String, sinceVersion: Long,
                   keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val vs = versions(spark, root).filter(_ >= sinceVersion)
    require(vs.headOption.contains(sinceVersion),
      s"SnapshotTable.changesSince: v$sinceVersion is not in the " +
        s"retained window (${versions(spark, root).mkString(",")}) — " +
        "the consumer fell behind vacuum; re-bootstrap from read()")
    val steps = vs.sliding(2).collect { case Seq(a, b) =>
      diff(spark, root, a, b, keys).withColumn("version", lit(b))
    }.toSeq
    steps.reduceOption(_ unionByName _).getOrElse(
      // already caught up: an EMPTY changelog with the right schema
      diff(spark, root, sinceVersion, sinceVersion, keys)
        .withColumn("version", lit(sinceVersion)).limit(0))
  }

  /** Reclaim space: keep the newest `keepVersions` manifests, delete
    * older manifests, every data file no retained manifest references,
    * and all staging/temp orphans (crashed commits). Readers pinned
    * inside the retained window are unaffected; `keepVersions` is the
    * table's read-transaction horizon.
    *
    * WRITER-EXCLUSIVE, named: the staging sweep cannot tell a crashed
    * commit's orphan from a LIVE committer's in-flight write, so run
    * vacuum from the table's (single) writer between its own commits —
    * a victim committer fails loudly at its staging rename (nothing
    * tears), but that failure is an operational foot-gun, not a
    * feature. Returns (manifestsDeleted, dataDirsDeleted). */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2)
      : (Int, Int) = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val (fs, rootP) = fsOf(spark, root)
    val all = versions(spark, root)
    val keep = all.takeRight(keepVersions).toSet
    val referenced: Set[String] =
      keep.flatMap(readManifest(fs, rootP, _).map(entryPath))
    // nonce-directory granularity: a data dir goes when NONE of its
    // files is referenced by a retained manifest (files of one commit
    // share a manifest's fate, so partial references cannot happen)
    val dataHome = new Path(rootP, DataDir)
    var dirsDeleted = 0
    if (fs.exists(dataHome)) fs.listStatus(dataHome).foreach { st =>
      val nonce = st.getPath.getName
      if (!referenced.exists(_.startsWith(s"$DataDir/$nonce/"))) {
        fs.delete(st.getPath, true); dirsDeleted += 1
      }
    }
    var manifestsDeleted = 0
    val md = new Path(rootP, ManifestDir)
    if (fs.exists(md)) fs.listStatus(md).foreach { st =>
      st.getPath.getName match {
        case ManifestRe(d) if !keep.contains(d.toLong) =>
          fs.delete(st.getPath, false); manifestsDeleted += 1
        case n if n.startsWith(".tmp-") =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
    val sd = new Path(rootP, StagingDir)
    if (fs.exists(sd)) { fs.delete(sd, true); () }
    (manifestsDeleted, dirsDeleted)
  }
}
