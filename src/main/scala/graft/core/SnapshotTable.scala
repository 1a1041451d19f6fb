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
  *   <root>/_manifests/v%09d.lock                exclusive version claims (see CONCURRENCY)
  *   <root>/_changes/v%09d.changes/part-*.parquet  stored change feed (tracked commits only)
  *   <root>/_dv/<commit-nonce>/part-*.parquet    deletion-vector sidecars ([[deleteWhereDV]])
  *   <root>/_staging/...                         in-flight writes (orphaned by a crash)
  * }}}
  *
  * DELETES come in both industry shapes: [[deleteWhere]] is
  * copy-on-write (rewrites only the files holding matching rows —
  * right when deletes cluster with the layout), [[deleteWhereDV]] is
  * merge-on-read (positional tombstones in a `_dv/` sidecar, zero
  * data-file rewrites — right for scattered point deletes), and
  * [[compactSnapshot]] folds tombstones back into clean files.
  *
  * A manifest ENTRY is the file's root-relative path, optionally
  * followed by TAB + per-column stats sections, comma-joined:
  * `col=min:max` long ranges (`statsCols`), `col#v1|v2` category sets
  * (`categoryCols`), `col~m:k:b64bits` Bloom filters (`bloomCols`),
  * and a `!bytes` FILE-SIZE section (always recorded by current
  * writers — the '!' cannot collide with a column name, which is
  * `[A-Za-z0-9_]+`) — Iceberg's file-pruning idea on one line of
  * text. The size section makes compaction planning and
  * [[history]]'s byte accounting MANIFEST-ONLY: at 400k files a
  * per-file `getFileStatus` sweep is 400k NameNode/S3 HEAD calls,
  * where the writer knew every length at commit time for free.
  * Entries without it (older manifests, hand-built DV lines) fall
  * back to the filesystem. [[scanPruned]]
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
  * CONCURRENCY: version numbers linearize committers through an
  * EXCLUSIVE CLAIM — before renaming, a committer creates
  * `v<N>.lock` with `FileSystem.create(overwrite = false)`, atomic-
  * exclusive where the filesystem provides it (HDFS
  * CreateFlag.CREATE; POSIX O_CREAT|O_EXCL). Two committers
  * therefore can never rename onto the same version there: the
  * loser's claim fails and it retries at the NEXT number (claimed
  * numbers are skipped, so a crashed claim leaves a harmless HOLE in
  * the version sequence, reclaimed by [[vacuum]], never a blocked
  * table). Hadoop's LOCAL filesystem is weaker — RawLocal/
  * ChecksumFileSystem implement create(overwrite=false) as a
  * non-atomic exists-then-create — so there the claim is best-effort
  * and the defense is the PUBLISH step: a same-number racer's rename
  * is refused (the target exists) or its read-back shows foreign
  * content; the loser retries at a later version. Honest limit: on a
  * store that both lacks atomic claims AND replaces on rename, two
  * racers could in principle each read back their own content before
  * the other's rename lands (a TOCTOU window) — local FS is a
  * convenience tier, not the contract; production tables belong on a
  * claim-atomic store (see FILESYSTEM CONTRACT). On claim-atomic
  * stores the read-back is belt-and-braces only.
  * Claims linearize version NUMBERS; read-merge-commit CYCLES are
  * additionally VALIDATED: [[upsertCycle]], [[upsertTargeted]],
  * [[compactSnapshot]], [[deleteWhere]] and [[applyChangesCycle]]
  * carry their base version into [[publishValidated]], which commits
  * at EXACTLY base+1 (the claim is the compare-and-swap) and reports
  * a conflict otherwise — the caller then re-reads, re-merges and
  * retries, so two concurrent cyclers SERIALIZE instead of losing
  * the earlier merge (Iceberg's commit validation). [[append]]
  * validates too — its manifest union is a read-modify-write of the
  * file list. Plain [[commit]] (replace semantics — last writer wins
  * by intent) stays unvalidated and skips past contended numbers.
  * Named residual:
  * a committer that crashes between claim and rename leaves a hole
  * that unvalidated writers skip but validated cyclers refuse loudly
  * (see [[publishValidated]]'s remediation message) — skipping a
  * hole silently is exactly the lost update validation exists to
  * prevent.
  *
  * FILESYSTEM CONTRACT, named: the protocol needs (a) atomic-exclusive
  * `create(overwrite = false)` for the claim and (b) same-directory
  * `rename` that either moves the temp manifest or fails — HDFS and
  * POSIX local filesystems give both. S3A gives NEITHER natively
  * (create is a PUT that last-writer-wins unless the store supports
  * conditional writes; rename is copy+delete): on object storage,
  * point the claim+publish at a small HDFS/locking volume, front the
  * table with an external catalog lock (Hive/Glue/DynamoDB — what
  * Delta's S3 LogStore and Iceberg's lock-manager do), or enable the
  * store's conditional-put (If-None-Match) support. Data files are
  * immutable and nonce-named, so THEY are object-store-safe as-is;
  * only the manifest publish needs the stronger primitive.
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
  private val ChangesDir = "_changes"
  private val DvDir = "_dv"
  private val ManifestRe = """v(\d{9})\.manifest""".r
  private val LockRe = """v(\d{9})\.lock""".r
  private val ChangesRe = """v(\d{9})\.changes""".r
  private val MaxCommitRetries = 5

  /** Per-file distinct-value cap for `categoryCols`: a file whose
    * column exceeds it records NO category section (never pruned) —
    * category stats are for LOW-cardinality slice columns (lang,
    * source, split), where a file clustered by the column holds a
    * handful of values. */
  val CategoryCap = 16

  /** Default Bloom width (bits) for `bloomCols`, and the saturation
    * rule: a file records a Bloom section only while its distinct
    * count stays ≤ bits/8 (k=4 → ~2.4% false-keep rate at the cap);
    * past that the section is omitted (the file is always kept — the
    * superset contract), because a saturated Bloom keeps everything
    * anyway and only bloats the manifest. */
  val DefaultBloomBits = 2048
  private val BloomK = 4

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

  /** (name, type) schema signature for compatibility checks — a
    * same-named column of a DIFFERENT type is exactly the
    * mixed-schema manifest these guards exist to prevent (which file
    * Spark samples would decide the read schema); column ORDER is
    * free (parquet reads match by name). */
  private def schemaSig(s: org.apache.spark.sql.types.StructType): Seq[String] =
    s.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
      .sorted.toSeq

  /** A manifest entry's root-relative file path (the part before the
    * optional TAB-separated stats). */
  private def entryPath(line: String): String = {
    val t = line.indexOf('\t')
    if (t < 0) line else line.substring(0, t)
  }

  /** Split manifest entries into (data entries, deletion-vector
    * entries). DV entries are ordinary manifest lines whose path
    * lives under `_dv/` — committed, time-traveled and vacuumed like
    * data, but applied as tombstones at read time instead of scanned
    * as rows (see [[deleteWhereDV]]). */
  private def splitEntries(entries: Seq[String]): (Seq[String], Seq[String]) =
    entries.partition(e => !entryPath(e).startsWith(s"$DvDir/"))

  /** Read `dataEntries` with positional identity attached —
    * `__graft_fn` (file base name; part names carry a UUID, so it is
    * unique) and `__graft_ri` (row ordinal within the file, parquet's
    * `_metadata.row_index`) — and `dvEntries`' tombstones already
    * EXCLUDED via one anti-join on that identity (the DV side is tiny
    * relative to data, so AQE broadcasts it). The core of every
    * DV-aware read; callers drop the identity columns unless they
    * need them (hit detection, tombstone writing). */
  private def readWithPos(spark: SparkSession, rootP: Path,
                          dataEntries: Seq[String],
                          dvEntries: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val data = spark.read.parquet(
        dataEntries.map(e => new Path(rootP, entryPath(e)).toString): _*)
      .select(col("*"),
        element_at(split(col("_metadata.file_path"), "/"), -1)
          .as("__graft_fn"),
        col("_metadata.row_index").as("__graft_ri"))
    if (dvEntries.isEmpty) data
    else data.join(
      spark.read.parquet(
          dvEntries.map(e => new Path(rootP, entryPath(e)).toString): _*)
        .select(col("file_name").as("__graft_fn"),
          col("row_index").as("__graft_ri")),
      Seq("__graft_fn", "__graft_ri"), "left_anti")
  }

  /** Read `dataEntries` as plain rows with `dvEntries` applied. The
    * DV-free path stays a bare parquet scan — no metadata columns, no
    * join — so tables that never used [[deleteWhereDV]] keep their
    * exact pre-DV plans. */
  private def readEntriesWithDv(spark: SparkSession, rootP: Path,
                                dataEntries: Seq[String],
                                dvEntries: Seq[String]): DataFrame =
    if (dvEntries.isEmpty)
      spark.read.parquet(
        dataEntries.map(e => new Path(rootP, entryPath(e)).toString): _*)
    else readWithPos(spark, rootP, dataEntries, dvEntries)
      .drop("__graft_fn", "__graft_ri")

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

  /** A manifest entry's recorded FILE SIZE (`!bytes`) — None for
    * entries written before the size section existed (and for
    * hand-assembled DV lines); callers fall back to the filesystem. */
  private[graft] def entryBytes(line: String): Option[Long] = {
    val t = line.indexOf('\t')
    if (t < 0) return None
    line.substring(t + 1).split(',').iterator
      .collectFirst { case kv if kv.startsWith("!") =>
        kv.substring(1).toLong }
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

  /** A manifest entry's recorded per-column BLOOM sections
    * (`col~m:k:b64bits`, base64 without padding so '=' stays a range
    * delimiter) — the point-lookup twin of [[entryStats]], recorded
    * when the committer passed `bloomCols` and the file's distinct
    * count stayed under the saturation cap. */
  private[core] def entryBlooms(line: String)
      : Map[String, (Int, Int, java.util.BitSet)] = {
    val t = line.indexOf('\t')
    if (t < 0) return Map.empty
    line.substring(t + 1).split(',').iterator
      .filter(kv => kv.contains('~') && !kv.contains('=') && !kv.contains('#'))
      .map { kv =>
        val tl = kv.indexOf('~')
        val Array(m, k, bits) = kv.substring(tl + 1).split(":", 3)
        kv.substring(0, tl) -> ((m.toInt, k.toInt,
          java.util.BitSet.valueOf(
            java.util.Base64.getDecoder.decode(bits))))
      }.toMap
  }

  /** The k deterministic bit positions of `value` in an m-bit Bloom —
    * double hashing over the md5 halves, identical on writer and
    * prober by construction (no JVM hash seeds involved). */
  private def bloomBitsOf(value: String, m: Int, k: Int): Seq[Int] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.wrap(d)
    val h1 = bb.getLong
    val h2 = bb.getLong
    (0 until k).map { i =>
      val h = h1 + i.toLong * h2
      (((h % m) + m) % m).toInt
    }
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
    val (dataE, dvE) = splitEntries(files)
    if (dataE.isEmpty)
      // unreachable by construction: even an empty-DataFrame commit
      // publishes a schema-only part file (publish() requires it), so
      // a dataless manifest can only mean external tampering
      throw new IllegalStateException(
        s"SnapshotTable at $root: manifest v$v lists no data files")
    readEntriesWithDv(spark, rootP, dataE, dvE)
  }

  /** The current snapshot as a DataFrame whose SCAN prunes files
    * TRANSPARENTLY: the relation is built over a manifest-backed
    * [[graft.sources.SnapshotFileIndex]], so any filter Spark pushes
    * down reaches the index and skips the files whose recorded
    * range/category/Bloom sections cannot match — `table(...).filter
    * (col("k") === 42)` plans the same file set as an explicit
    * [[scanPrunedBloom]] probe, with no special API on the read path
    * (the Delta/Iceberg data-skipping integration on the house
    * format). The scan itself is Spark's native vectorized parquet
    * reader; file list and sizes come from the manifest, so planning
    * performs no per-file filesystem calls. Falls back to the plain
    * [[read]] when the snapshot carries LIVE deletion vectors (the
    * MOR anti-join wraps the whole scan and Spark does not push
    * filters through the join's probe side; compact first, or accept
    * unpruned scans until then — documented MOR read price). */
  def table(spark: SparkSession, root: String): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val (dataE, dvE) = splitEntries(readManifest(fs, rootP, v))
    if (dvE.nonEmpty) return readVersion(spark, root, v)
    val index = graft.sources.SnapshotFileIndex(spark, rootP, dataE)
    val schema = spark.read.parquet(
      new Path(rootP, entryPath(dataE.head)).toString).schema
    val relation = org.apache.spark.sql.execution.datasources
      .HadoopFsRelation(
        index,
        partitionSchema = org.apache.spark.sql.types.StructType(Nil),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new org.apache.spark.sql.execution.datasources
          .parquet.ParquetFileFormat(),
        options = Map.empty)(spark)
    spark.baseRelationToDataFrame(relation)
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
                             categoryCols: Seq[String] = Nil,
                             bloomCols: Seq[String] = Nil,
                             bloomBits: Int = DefaultBloomBits): Seq[String] = {
    require(bloomBits >= 64 && bloomBits % 8 == 0,
      s"bloomBits must be a multiple of 8 >= 64, got $bloomBits")
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val staging = new Path(new Path(rootP, StagingDir), nonce)
    val writer = bloomCols.foldLeft(
      df.write.mode("overwrite").option("compression", "zstd")) {
      // also enable parquet's OWN bloom filters inside the files: the
      // manifest bloom prunes FILES before any scan, parquet's prunes
      // row groups inside the kept ones — the same two-layer compose
      // as scanPruned's manifest ranges + PushedFilters
      (w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    writer.parquet(staging.toString)
    val dataHome = new Path(new Path(rootP, DataDir), nonce)
    fs.mkdirs(dataHome.getParent)
    if (!fs.rename(staging, dataHome))
      sys.error(s"SnapshotTable: could not move staged data $staging " +
        s"into place at $dataHome")
    val lenByRel: Map[String, Long] = fs.listStatus(dataHome)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$DataDir/$nonce/${st.getPath.getName}" -> st.getLen)
      .toMap
    val rels = lenByRel.keys.toSeq.sorted
    // the size section is free (the listing above already returned
    // every length) and always recorded — compaction planning and
    // history's byte accounting then never sweep the filesystem
    def sized(rel: String, sections: Seq[String]): String =
      s"$rel\t${(sections :+ s"!${lenByRel(rel)}").mkString(",")}"
    if (statsCols.isEmpty && categoryCols.isEmpty && bloomCols.isEmpty)
      rels.map(sized(_, Nil))
    else {
      // the stats suffix is a text format (TAB, ',', '=', ':', '#',
      // '~' and '|' are structural) — refuse names that would corrupt
      // it rather than write an unparseable manifest; category VALUES
      // are URL-encoded and bloom bits are base64-without-padding, so
      // they carry anything
      (statsCols ++ categoryCols ++ bloomCols).foreach(c => require(
        c.matches("[A-Za-z0-9_]+"),
        s"SnapshotTable stats/category/bloom column name '$c' is not " +
          "[A-Za-z0-9_]+ — rename or alias before recording stats"))
      import org.apache.spark.sql.functions._
      val bloomCap = bloomBits / 8
      val written = spark.read.parquet(dataHome.toString)
      // job 1: per-file long min/max — constant-size aggregation
      // state. try_cast, not cast: under ANSI (Spark's default) a
      // malformed value in a statsCol would otherwise FAIL the whole
      // commit, where the documented contract is "a non-castable
      // column records null bounds and is simply never pruned"
      val rangeByBase =
        if (statsCols.isEmpty) Map.empty[String, org.apache.spark.sql.Row]
        else {
          val aggs = statsCols.flatMap(c => Seq(
            min(expr(s"try_cast($c AS BIGINT)")).as(s"__mn_$c"),
            max(expr(s"try_cast($c AS BIGINT)")).as(s"__mx_$c")))
          written.groupBy(input_file_name().as("__f"))
            .agg(aggs.head, aggs.tail: _*)
            .collect()
            .map(r => new Path(r.getString(0)).getName -> r).toMap
        }
      // job 2: per-(file, column) distinct VALUE SETS for category and
      // bloom sections, EXECUTOR-BOUNDED: unpivot → distinct → rank →
      // cap happens BEFORE any collect_set, so a genuinely high-
      // cardinality column spills through the hash-distinct and the
      // rank sort instead of accumulating its full per-file set in one
      // aggregation buffer (a pre-round-15 slice() bounded only the
      // driver transfer, not the executor-side accumulation — an
      // ADVICE-flagged OOM risk). collect_set then sees at most
      // maxCap+2 rows per group.
      val setColNames = (categoryCols ++ bloomCols).distinct
      val maxCap = math.max(if (categoryCols.nonEmpty) CategoryCap else 0,
        if (bloomCols.nonEmpty) bloomCap else 0)
      val setsByKey =
        if (setColNames.isEmpty) Map.empty[(String, String), Seq[String]]
        else {
          // ONE scan, unpivoted in-row: a union of per-column selects
          // would re-read the freshly written files once per recorded
          // column (k scans for k category/bloom columns) — the
          // explode emits the same (file, column, value) rows from a
          // single pass
          val pairs = written.select(
              input_file_name().as("__f"),
              explode(array(setColNames.map(c =>
                struct(lit(c).as("__c"),
                  col(c).cast("string").as("__v"))): _*)).as("__e"))
            .select(col("__f"), col("__e.__c").as("__c"),
              col("__e.__v").as("__v"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("__f", "__c").orderBy(col("__v").asc_nulls_first)
          // cap+2 ranked distinct values suffice to DETECT saturation
          // for every per-kind cap k ≤ maxCap, even when one kept slot
          // is the null marker: non-null distinct ≤ k keeps the whole
          // set (≤ k+1 rows incl. null survive the filter); non-null
          // distinct > k keeps ≥ k+1 non-null values, tripping the
          // size check below either way
          pairs.distinct()
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") <= maxCap + 2)
            .groupBy("__f", "__c")
            .agg(sort_array(collect_set(col("__v"))).as("__vs"))
            .collect()
            .map(r => (new Path(r.getString(0)).getName, r.getString(1)) ->
              r.getSeq[String](2)).toMap
        }
      rels.map { rel =>
        // a zero-row part file appears in NO group of either job: no
        // stats sections, never pruned (superset contract)
        val base = rel.split('/').last
        val ranges = rangeByBase.get(base).toSeq.flatMap { r =>
          statsCols.zipWithIndex.map { case (c, i) =>
            val mn = if (r.isNullAt(1 + 2 * i)) "" else r.getLong(1 + 2 * i).toString
            val mx = if (r.isNullAt(2 + 2 * i)) "" else r.getLong(2 + 2 * i).toString
            s"$c=$mn:$mx"
          }
        }
        val cats = categoryCols.flatMap { c =>
          setsByKey.get((base, c)).flatMap { vs =>
            // over-cap: record nothing — the file is never pruned on
            // this column (superset contract); an EMPTY set (all-null
            // file) records `c#`, which equality-prunes everything —
            // a null never equals the probe value
            if (vs.size > CategoryCap) None
            else Some(s"$c#" + vs.map(
              java.net.URLEncoder.encode(_, "UTF-8")).mkString("|"))
          }
        }
        val blooms = bloomCols.flatMap { c =>
          setsByKey.get((base, c)).flatMap { vs =>
            // saturation: a bloom past bits/8 distinct values keeps
            // ~everything anyway — record nothing (superset contract)
            // instead of bloating the manifest; an all-null file's
            // empty bloom prunes every probe, like the category case
            if (vs.size > bloomCap) None
            else {
              val bs = new java.util.BitSet(bloomBits)
              vs.foreach(v => bloomBitsOf(v, bloomBits, BloomK)
                .foreach(bs.set))
              Some(s"$c~$bloomBits:$BloomK:" +
                java.util.Base64.getEncoder.withoutPadding
                  .encodeToString(bs.toByteArray))
            }
          }
        }
        sized(rel, ranges ++ cats ++ blooms)
      }
    }
  }

  private def lockPath(root: Path, v: Long): Path =
    new Path(new Path(root, ManifestDir), f"v$v%09d.lock")

  /** Atomically claim version `v` — `create(overwrite = false)` is
    * exclusive on HDFS and POSIX-backed stores (see the FILESYSTEM
    * CONTRACT note). False means another committer holds (or held)
    * the number — CONTENTION, distinguished from environment faults
    * (permissions, transient FS errors), which are RETHROWN: swallowing
    * them as "claimed" would burn retry attempts on version-number
    * holes and misreport a broken filesystem as a concurrent writer. */
  private def claimVersion(fs: FileSystem, rootP: Path, v: Long): Boolean =
    try { fs.create(lockPath(rootP, v), false).close(); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException =>
        // RawLocalFileSystem reports an existing target as a bare
        // IOException — verify before classifying as contention
        if (fs.exists(lockPath(rootP, v))) false else throw e
    }

  /** Write `lines` to a temp manifest and atomically rename it onto
    * version `v` (which the caller must have claimed); returns
    * whether OUR content is what got published. On HDFS/POSIX the
    * claim rules out a collision, so this is always true. On a
    * filesystem whose create(overwrite=false) is a non-atomic
    * exists-then-create (Hadoop's RawLocal/ChecksumFileSystem), two
    * committers can both "claim" the same number — depending on the
    * store's rename semantics the loser either fails the rename
    * (target already exists) or replaces-and-is-replaced; both
    * surface here as `false` (rename-refused with an existing target,
    * or a foreign read-back), meaning our content was never
    * published and the caller must retry. A rename failure with NO
    * target present is a genuine environment fault and stays loud. */
  private def renameIntoManifest(fs: FileSystem, rootP: Path, v: Long,
                                 lines: Seq[String]): Boolean = {
    val body = lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = new Path(new Path(rootP, ManifestDir),
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    val target = manifestPath(rootP, v)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      if (fs.exists(target)) return false // a same-number racer won
      sys.error(s"SnapshotTable: rename of the claimed manifest " +
        s"v$v failed at $rootP with no competing manifest present — " +
        "an environment fault (permissions, filesystem), not a race; " +
        "nothing was published")
    }
    readManifest(fs, rootP, v) == lines
  }

  /** Publish `lines` as the next manifest. Returns the committed
    * version. A contended version number is skipped, never shared
    * (see the CONCURRENCY note above). */
  private def publish(fs: FileSystem, rootP: Path, lines: Seq[String])
      : Long = {
    // an EMPTY DataFrame still commits: Spark writes a zero-row
    // part file carrying the schema, so the manifest is never
    // fileless (a schema-only snapshot is a legal table state); a
    // genuinely fileless manifest would mean a writer bug upstream
    require(lines.nonEmpty,
      "SnapshotTable: refusing to publish a fileless manifest — even " +
        "an empty snapshot carries a schema-only part file")
    fs.mkdirs(new Path(rootP, ManifestDir))
    var attempt = 0
    var tried = 0L
    while (attempt < MaxCommitRetries) {
      // skip past both the committed tip and every number we already
      // found claimed — a crashed claim must not wedge the table
      val next = math.max(currentVersion(fs, rootP).getOrElse(0L) + 1, tried + 1)
      tried = next
      // the claim is exclusive, so the target name cannot exist:
      // manifests only ever appear at claimed numbers, claims are
      // never re-grantable, and vacuum only reclaims locks at or
      // below the committed tip (next is above it)
      if (claimVersion(fs, rootP, next) &&
          renameIntoManifest(fs, rootP, next, lines))
        return next
      attempt += 1
    }
    sys.error(s"SnapshotTable: could not claim a version after " +
      s"$MaxCommitRetries attempts at $rootP — a second writer is " +
      "committing concurrently; serialize committers (one writer per " +
      "table is the contract)")
  }

  /** A validated publish's outcome: [[Committed]] at base+1, or
    * [[Conflicted]] — another committer moved the table past the
    * caller's base, so its merge is stale and must be rebased
    * (re-read, re-merge, retry). */
  private sealed trait ValidatedResult
  private case class Committed(version: Long) extends ValidatedResult
  private case object Conflicted extends ValidatedResult

  /** How long a validated publish waits for a contended claim at
    * base+1 to turn into a manifest before declaring the claimer
    * crashed. Claims are held for milliseconds (between claim and
    * rename), so 10 s separates a slow committer from a dead one. */
  private[core] val StaleClaimWaitMs = 10000L

  /** Publish `lines` at EXACTLY base+1, iff the table still stands at
    * `base` — the compare-and-swap a read-merge-commit cycle needs to
    * be serializable (Iceberg's commit validation on the house
    * format). The exclusive claim at base+1 is the linearization
    * point: a competing committer either claimed base+1 first (we
    * wait for its manifest, then report [[Conflicted]] so the caller
    * rebases) or must claim ≥ base+2, where ITS validation fails and
    * IT rebases on top of us. Named cost: a committer that crashes
    * between claim and rename wedges validated commits at this base —
    * reported LOUDLY after [[StaleClaimWaitMs]] with the remediation,
    * never as a silent skip (skipping is exactly the lost update this
    * path exists to prevent). */
  private def publishValidated(fs: FileSystem, rootP: Path,
                               base: Option[Long], lines: Seq[String])
      : ValidatedResult = {
    require(lines.nonEmpty,
      "SnapshotTable: refusing to publish a fileless manifest — even " +
        "an empty snapshot carries a schema-only part file")
    if (currentVersion(fs, rootP) != base) return Conflicted
    val want = base.getOrElse(0L) + 1
    fs.mkdirs(new Path(rootP, ManifestDir))
    if (!claimVersion(fs, rootP, want)) {
      // base+1 is claimed by someone else: a LIVE committer publishes
      // within milliseconds (then we conflict and rebase); a crashed
      // one never will — wait bounded, watching the TABLE, not just
      // the claimed number (the other committer may publish at a
      // different number if it was an unvalidated writer skipping
      // holes)
      val deadline = System.currentTimeMillis() + StaleClaimWaitMs
      while (System.currentTimeMillis() < deadline) {
        if (currentVersion(fs, rootP) != base) return Conflicted
        Thread.sleep(50)
      }
      sys.error(s"SnapshotTable: validated commit at $rootP cannot " +
        s"proceed — v$want is claimed but no manifest appeared within " +
        s"${StaleClaimWaitMs}ms and the table still stands at " +
        s"v${base.getOrElse(0L)}; a committer crashed between claim " +
        "and publish. Confirm the claimer is dead, delete " +
        f"_manifests/v$want%09d.lock, and retry (an unvalidated " +
        "commit/append can skip past the hole, at the cost of the " +
        "lost-update check)")
    }
    // claimed base+1: rename and read back. A non-publish means a
    // best-effort-local-FS racer beat us to the number — our content
    // was never published, so rebase like any other conflict.
    if (renameIntoManifest(fs, rootP, want, lines))
      Committed(want)
    else Conflicted
  }

  /** Retry budget for validated cycles: how many times a
    * read-merge-commit cycle rebases onto a moved table before
    * failing loudly (each retry re-reads, re-merges, re-writes its
    * data files — the orphans of lost attempts are vacuum's to
    * reclaim). */
  private val MaxRebaseRetries = 10

  /** Run one read-merge-commit CYCLE serializably: `attempt` sees the
    * current base version and returns either `Right(lines, out)` —
    * the manifest to publish at base+1 — or `Left(out)` — a no-op
    * against this base (nothing publishes). On conflict the whole
    * attempt re-runs against the new base. This is the rebase loop
    * under every cycle API ([[upsertCycle]], [[upsertTargeted]],
    * [[compactSnapshot]], [[deleteWhere]], [[applyChangesCycle]]).
    * Returns (Some(committedVersion) | None-for-no-op, out). */
  private def rebaseLoop[A](fs: FileSystem, rootP: Path)
      (attempt: Option[Long] => Either[A, (Seq[String], A)])
      : (Option[Long], A) = {
    var tries = 0
    while (tries < MaxRebaseRetries) {
      val base = currentVersion(fs, rootP)
      attempt(base) match {
        case Left(out) => return (None, out)
        case Right((lines, out)) =>
          publishValidated(fs, rootP, base, lines) match {
            case Committed(v) => return (Some(v), out)
            case Conflicted => tries += 1
          }
      }
    }
    sys.error(s"SnapshotTable: a read-merge-commit cycle at $rootP " +
      s"lost the commit race $MaxRebaseRetries times in a row — " +
      "another writer is committing continuously; back off or " +
      "serialize the cyclers")
  }

  /** Commit `df` as the next FULL snapshot (replace semantics — the
    * shape a merge-upsert cycle produces). `statsCols` records
    * per-file long min/max in the manifest for [[scanPruned]].
    * Non-empty `changeKeys` additionally stores the commit's row-level
    * changelog for the CDC feed (see [[readChanges]]); change tracking
    * assumes the table is KEYED on `changeKeys` (unique key per row —
    * what the upsert path maintains). Returns the new version. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
             statsCols: Seq[String] = Nil,
             categoryCols: Seq[String] = Nil,
             changeKeys: Seq[String] = Nil,
             bloomCols: Seq[String] = Nil,
             bloomBits: Int = DefaultBloomBits): Long = {
    val (fs, rootP) = fsOf(spark, root)
    val prev = currentVersion(fs, rootP)
    val v = publish(fs, rootP,
      writeDataFiles(spark, fs, rootP, df, statsCols, categoryCols,
        bloomCols, bloomBits))
    if (changeKeys.nonEmpty) recordChanges(spark, root, prev, v, changeKeys)
    v
  }

  /** Commit `df` as an APPEND snapshot: the new manifest lists every
    * entry of the current snapshot (prior stats preserved verbatim)
    * plus `df`'s new files — no data is rewritten, the format's
    * append is manifest-only. The appended frame's columns must match
    * the current snapshot's (checked LOUDLY): one manifest mixing
    * file schemas would make reads silently drop or misalign columns
    * depending on which file Spark samples first — schema changes go
    * through a full [[commit]] (replace), never an append.
    *
    * A TRACKED append (`changeKeys` non-empty) records its changelog
    * as the appended rows themselves, as inserts — O(batch), read
    * back from the just-written files, never a table diff — which is
    * exact precisely when the appended keys are NEW. That is also the
    * keyed-table contract: append is file-level, so a colliding key
    * would silently DUPLICATE (not replace), breaking every keyed
    * consumer downstream — tracked appends therefore hit-detect the
    * batch keys against the base (the [[upsertTargeted]] machinery:
    * stats/Bloom-pruned, column-pruned key scan) and REFUSE loudly on
    * a collision; a colliding batch belongs in [[upsertTargeted]].
    * Returns the new version. */
  def append(spark: SparkSession, root: String, df: DataFrame,
             statsCols: Seq[String] = Nil,
             categoryCols: Seq[String] = Nil,
             changeKeys: Seq[String] = Nil,
             bloomCols: Seq[String] = Nil,
             bloomBits: Int = DefaultBloomBits): Long = {
    import org.apache.spark.sql.functions._
    val (fs, rootP) = fsOf(spark, root)
    if (changeKeys.nonEmpty)
      // the keyed contract, loud like the cycles': a NULL key cannot
      // be tracked (and would break the very consumers the feed is for)
      require(df.filter(
          changeKeys.map(col(_).isNull).reduce(_ || _)).limit(1).isEmpty,
        s"SnapshotTable.append: tracked append carries NULL in a key " +
          s"(${changeKeys.mkString(",")}) — keyed tables require " +
          "non-null keys")
    def checkSchema(bv: Long): Unit = {
      val have = schemaSig(readVersion(spark, root, bv).schema)
      val got = schemaSig(df.schema)
      require(have == got,
        s"SnapshotTable.append: schema mismatch — snapshot v$bv has " +
          s"(${have.mkString(",")}) but the appended frame has " +
          s"(${got.mkString(",")}); a mixed-schema manifest reads " +
          "nondeterministically, so evolve the schema with " +
          "evolveAddColumns / a full commit instead")
    }
    def checkDisjoint(bv: Long): Unit = if (changeKeys.nonEmpty) {
      val (entries, dvE) = splitEntries(readManifest(fs, rootP, bv))
      val bk = df.select(changeKeys.map(col): _*).distinct()
      val (touched, _) =
        detectTouched(spark, rootP, entries, dvE, changeKeys, bk)
      require(touched.isEmpty,
        s"SnapshotTable.append: tracked append carries keys already " +
          s"present in snapshot v$bv (${touched.size} file(s) hit) — " +
          "append is file-level and would DUPLICATE them; route " +
          "colliding batches through upsertTargeted")
    }
    // fail-fast pre-checks BEFORE the (possibly huge) data write — a
    // mismatched append must not strand a full frame of orphan files
    // for vacuum; the in-loop checks re-run per rebase in case the
    // table moved under us
    currentVersion(fs, rootP).foreach { bv =>
      checkSchema(bv); checkDisjoint(bv)
    }
    // the new data files don't depend on the base version — write them
    // ONCE; only the manifest union re-runs on a rebase (an append is
    // a read-modify-write of the file LIST, so it validates like the
    // cycles: two concurrent appends must both survive into the tip)
    val newEntries = writeDataFiles(spark, fs, rootP, df, statsCols,
      categoryCols, bloomCols, bloomBits)
    val (v, _) = rebaseLoop(fs, rootP) { base =>
      base.foreach { bv => checkSchema(bv); checkDisjoint(bv) }
      val prior = base.map(readManifest(fs, rootP, _)).getOrElse(Nil)
      Right((prior ++ newEntries, base))
    }
    if (changeKeys.nonEmpty) {
      // the feed step is the appended rows as inserts, read back from
      // the just-written files — O(batch) with no lineage re-pay, and
      // exact by the disjointness guard above
      val written = spark.read.parquet(
        newEntries.map(e => new Path(rootP, entryPath(e)).toString): _*)
      val nonKeys = written.columns.filterNot(changeKeys.contains).toSeq
      recordChangesStep(spark, root,
        v.get - 1, v.get,
        written.select(changeKeys.map(col) ++
          Seq(lit("insert").as("change")) ++ nonKeys.map(col): _*))
    }
    v.get
  }

  /** Schema evolution as a MIGRATION COMMIT — the exit ramp for
    * [[append]]'s drift refusal (the reference's add-column evolution,
    * `SURVEY.md` D1, at row scale): read the current snapshot, project
    * each `(name, defaultExpr)` onto it, and publish the widened table
    * as the next FULL version. Old versions keep their old schema
    * (time travel is untouched — each manifest pins its own files);
    * appends of the NEW schema then pass the guard. The rewrite cost
    * is one full-table pass — the honest price of materializing a
    * default into immutable files; a table too large for that should
    * carry the column from birth or virtualize the default in a view.
    *
    * The migration commit deliberately lands UNTRACKED (no change-feed
    * entry): a changelog row cannot straddle two schemas, and every
    * CDC consumer's derived state needs the new column anyway — the
    * chain gap fails them loudly into the re-bootstrap they require
    * (see [[readChanges]]). */
  def evolveAddColumns(spark: SparkSession, root: String,
                       adds: Seq[(String, org.apache.spark.sql.Column)],
                       statsCols: Seq[String] = Nil,
                       categoryCols: Seq[String] = Nil): Long = {
    require(adds.nonEmpty, "evolveAddColumns: nothing to add")
    val cur = read(spark, root)
    adds.foreach { case (n, _) => require(!cur.columns.contains(n),
      s"evolveAddColumns: column '$n' already exists — evolution only " +
        "ADDS columns; rewrite semantics beyond that is a plain commit") }
    val widened = adds.foldLeft(cur) { case (d, (n, c)) => d.withColumn(n, c) }
    commit(spark, root, widened, statsCols, categoryCols)
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
    val (dataE, dvE) = splitEntries(readManifest(fs, rootP, v))
    val kept = prunedEntries(dataE, colName, lo, hi)
    if (kept.isEmpty)
      // all files pruned: an empty result with the right schema —
      // read one file's schema via the full version, filtered to false
      return readVersion(spark, root, v).limit(0)
    readEntriesWithDv(spark, rootP, kept, dvE)
  }

  /** (total files, files kept) for a [[scanPruned]] predicate on the
    * current snapshot — the observability half of pruning. */
  def pruneCounts(spark: SparkSession, root: String, colName: String,
                  lo: Long, hi: Long): (Int, Int) = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val all = splitEntries(readManifest(fs, rootP, v))._1
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
    val (dataE, dvE) = splitEntries(readManifest(fs, rootP, v))
    val kept = prunedEntriesEq(dataE, colName, value)
    if (kept.isEmpty) return readVersion(spark, root, v).limit(0)
    readEntriesWithDv(spark, rootP, kept, dvE)
  }

  /** (total files, files kept) for a [[scanPrunedEq]] probe. */
  def pruneCountsEq(spark: SparkSession, root: String, colName: String,
                    value: String): (Int, Int) = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val all = splitEntries(readManifest(fs, rootP, v))._1
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

  /** The current snapshot restricted to files whose recorded BLOOM for
    * `colName` may contain `value` — POINT-LOOKUP pruning for the
    * cardinality band the other two stats kinds don't cover: category
    * sets are exact but cap at [[CategoryCap]] distinct values per
    * file, min/max ranges need a range-clustered layout; a Bloom
    * prunes equality probes on an UNCLUSTERED commit up to bits/8
    * distinct values per file. Past that the section is omitted
    * (saturation) and the file is always kept — the same superset
    * contract as the other scans, so callers still apply the row
    * filter; false positives only cost an extra file open, never a
    * wrong row. For genuinely unique keys at 100 TB (millions of
    * distinct values per file) a manifest-resident Bloom cannot be
    * both small and useful — range-cluster the key and use
    * [[scanPruned]]; the parquet-native bloom written alongside
    * (row-group level) still helps inside kept files. `value` is
    * compared in the same `cast("string")` form the writer hashed. */
  def scanPrunedBloom(spark: SparkSession, root: String, colName: String,
                      value: String): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val (dataE, dvE) = splitEntries(readManifest(fs, rootP, v))
    val kept = prunedEntriesBloom(dataE, colName, value)
    if (kept.isEmpty) return readVersion(spark, root, v).limit(0)
    readEntriesWithDv(spark, rootP, kept, dvE)
  }

  /** (total files, files kept) for a [[scanPrunedBloom]] probe. */
  def pruneCountsBloom(spark: SparkSession, root: String, colName: String,
                       value: String): (Int, Int) = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    val all = splitEntries(readManifest(fs, rootP, v))._1
    (all.size, prunedEntriesBloom(all, colName, value).size)
  }

  private def prunedEntriesBloom(entries: Seq[String], colName: String,
                                 value: String): Seq[String] =
    entries.filter { e =>
      entryBlooms(e).get(colName) match {
        case Some((m, k, bits)) =>
          bloomBitsOf(value, m, k).forall(bits.get)
        case None => true // no bloom recorded (or saturated): never prune
      }
    }

  /** One incremental upsert cycle against the snapshot table —
    * [[graft.streaming.EventStreams.upsertBatch]]'s semantics
    * (last-writer-wins per key across cycles, deterministic
    * first-writer-wins by `tieBreak` within a cycle) on the
    * snapshot-committed layout: merge the batch with the CURRENT
    * snapshot, commit the merge as the next version, VALIDATED —
    * concurrent cyclers rebase instead of losing the earlier merge.
    * Idempotent in content: re-delivering a cycle (foreachBatch's
    * at-least-once crash replay) publishes a new version with
    * IDENTICAL rows. Concurrent readers keep their pinned snapshot
    * throughout.
    *
    * WRITE AMPLIFICATION, named: this path REWRITES the whole merged
    * table every cycle — the right shape when a cycle also wants a
    * fresh global layout (stats re-clustered), and an O(table) cost
    * everywhere else. The scale path is [[upsertTargeted]], which
    * rewrites only the files actually holding batch keys. */
  def upsertCycle(batch: DataFrame, root: String, keys: Seq[String],
                  tieBreak: Seq[org.apache.spark.sql.Column] = Nil,
                  statsCols: Seq[String] = Nil,
                  trackChanges: Boolean = false): Long = {
    val spark = batch.sparkSession
    val (fs, rootP) = fsOf(spark, root)
    val (v, base) = rebaseLoop(fs, rootP) { base =>
      val merged = base match {
        case Some(bv) =>
          graft.operators.Components.mergeFirstWriterWins(
            Seq(batch, readVersion(spark, root, bv)), keys, tieBreak)
        case None => batch
      }
      Right((writeDataFiles(spark, fs, rootP, merged, statsCols), base))
    }
    if (trackChanges) recordChanges(spark, root, base, v.get, keys)
    v.get
  }

  /** How many distinct batch-key values [[upsertTargeted]] will
    * collect to probe manifest Blooms driver-side. Probing costs
    * files × keys × k bit tests on the driver — trivial under this
    * cap, unbounded without one; a larger batch skips the Bloom
    * pre-prune and relies on the scan-side semi-join. */
  private val BloomProbeMaxKeys = 256

  /** Partition snapshot data `entries` into (touched, untouched) by
    * whether each file actually HOLDS one of `batchKeys`' key tuples —
    * the shared hit-detection core of [[upsertTargeted]] and
    * [[applyChangesCycle]]: recorded range stats bound the candidates
    * when every batch key is long-castable, recorded Blooms prune
    * point-wise for small batches (≤ [[BloomProbeMaxKeys]] distinct
    * keys), and the surviving candidates are read KEY COLUMNS ONLY
    * (column-pruned, DV-aware — a key surviving only as a tombstone
    * cannot touch its file) and semi-joined against the batch keys.
    * `batchKeys` must be the batch's DISTINCT, non-null key tuples. */
  private def detectTouched(spark: SparkSession, rootP: Path,
                            entries: Seq[String], dvE: Seq[String],
                            keys: Seq[String], batchKeys: DataFrame)
      : (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.functions._
    val keyCol = keys.head
    // manifest pre-prune on the FIRST key: recorded ranges bound
    // candidates ONLY when EVERY batch key casts to long — a mixed
    // batch (say "500" and "legacy-1") must not prune on the castable
    // keys' range alone, or the files holding the non-castable key
    // would escape hit detection and the key would silently duplicate
    // instead of replacing
    val rangeCands =
      if (!entries.exists(e => entryStats(e).contains(keyCol))) entries
      else {
        // try_cast: ANSI cast would fail the cycle on the first
        // non-numeric key instead of skipping the prune
        val kc = expr(s"try_cast($keyCol AS BIGINT)")
        val r = batchKeys.agg(min(kc), max(kc),
          count(col(keyCol)), count(kc)).head()
        if (r.isNullAt(0) || r.isNullAt(1) ||
            r.getLong(2) != r.getLong(3)) entries
        else prunedEntries(entries, keyCol, r.getLong(0), r.getLong(1))
      }
    // ...and recorded Blooms prune point-wise for small batches
    val cands =
      if (!rangeCands.exists(e => entryBlooms(e).contains(keyCol)))
        rangeCands
      else {
        val probe = batchKeys.select(col(keyCol).cast("string"))
          .filter(col(keyCol).isNotNull)
          .distinct().limit(BloomProbeMaxKeys + 1)
          .collect().map(_.getString(0))
        if (probe.length > BloomProbeMaxKeys) rangeCands
        else rangeCands.filter { e =>
          entryBlooms(e).get(keyCol) match {
            case Some((m, k, bits)) =>
              probe.exists(v => bloomBitsOf(v, m, k).forall(bits.get))
            case None => true
          }
        }
      }
    // hit detection: which candidate files actually HOLD a batch key
    val hit: Set[String] =
      if (cands.isEmpty) Set.empty
      else readWithPos(spark, rootP, cands, dvE)
        .select(keys.map(col) :+ col("__graft_fn"): _*)
        .join(batchKeys, keys, "left_semi")
        .select("__graft_fn").distinct().collect()
        .map(_.getString(0)).toSet
    entries.partition(e => hit.contains(new Path(entryPath(e)).getName))
  }

  /** One incremental upsert cycle that rewrites ONLY the files
    * actually holding batch keys — [[deleteWhere]]'s manifest-prune +
    * targeted-copy-on-write discipline applied to the keyed merge,
    * killing [[upsertCycle]]'s O(table) write amplification: a 1k-row
    * micro-batch against a 100 TB table touches the handful of files
    * its keys live in, appends the new-key rows as fresh files, and
    * references every other entry VERBATIM with its stats preserved.
    * Same semantics as [[upsertCycle]] (last-writer-wins per key
    * across cycles, `tieBreak` first-writer-wins within the batch),
    * same content-idempotence under at-least-once redelivery, same
    * validated rebase-retry under concurrent cyclers.
    *
    * Finding the touched files is itself sublinear when the table has
    * layout: per-file key ranges ([[scanPruned]]'s stats) bound the
    * candidates when the batch's keys are long-castable, and recorded
    * Blooms are probed driver-side for small batches (≤
    * [[BloomProbeMaxKeys]] distinct keys). Without layout the
    * hit-detection scan reads the candidates' KEY COLUMNS only
    * (column-pruned) and semi-joins the batch — far cheaper than the
    * full-rewrite it replaces, and the scan side Spark broadcasts the
    * small batch under AQE. `trackChanges` records the change feed
    * from the batch-scoped diff (O(batch + touched)), never a
    * whole-table join.
    *
    * Returns (version, filesRewritten, filesKeptVerbatim). */
  def upsertTargeted(batch: DataFrame, root: String, keys: Seq[String],
                     tieBreak: Seq[org.apache.spark.sql.Column] = Nil,
                     statsCols: Seq[String] = Nil,
                     categoryCols: Seq[String] = Nil,
                     bloomCols: Seq[String] = Nil,
                     bloomBits: Int = DefaultBloomBits,
                     trackChanges: Boolean = false): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "upsertTargeted needs merge keys")
    val spark = batch.sparkSession
    val (fs, rootP) = fsOf(spark, root)
    // resolve within-batch duplicates ONCE, outside the rebase loop —
    // the same (priority, tieBreak) ordering upsertCycle's merge uses.
    // CHECKPOINTED: the cycle evaluates the batch several times (key
    // guard, range agg, bloom probe, hit join, data write, feed step,
    // plus every rebase), and a batch with expensive lineage (a fresh
    // crawl's parse/join) must pay that lineage exactly once.
    val (resolved, resolvedIds) = Checkpoints.eager(
      graft.operators.Components
        .mergeFirstWriterWins(Seq(batch), keys, tieBreak))
    try {
      // the keyed-table contract, enforced loudly: a NULL merge key
      // would bypass the semi/anti joins below (SQL null never equals)
      // and DUPLICATE instead of replacing — a silent divergence from
      // upsertCycle's window merge, which groups nulls together
      require(resolved.filter(
          keys.map(col(_).isNull).reduce(_ || _)).limit(1).isEmpty,
        s"upsertTargeted: batch carries NULL in a merge key " +
          s"(${keys.mkString(",")}) — keyed tables require non-null keys")
      val batchKeys = resolved.select(keys.map(col): _*).distinct()
    val (nv, out) =
      rebaseLoop[(Long, Int, Int, () => DataFrame)](fs, rootP) {
        case None =>
          // first commit: the batch IS the table; the feed step is the
          // batch as inserts
          val lines = writeDataFiles(spark, fs, rootP, resolved,
            statsCols, categoryCols, bloomCols, bloomBits)
          val nonKeys = resolved.columns.filterNot(keys.contains).toSeq
          Right((lines, (0L, 0, 0, () => resolved.select(
            keys.map(col) ++ Seq(lit("insert").as("change")) ++
              nonKeys.map(col): _*))))
        case Some(bv) =>
          val have = schemaSig(readVersion(spark, root, bv).schema)
          val got = schemaSig(resolved.schema)
          require(have == got,
            s"upsertTargeted: schema mismatch — snapshot v$bv has " +
              s"(${have.mkString(",")}) but the batch has " +
              s"(${got.mkString(",")}); evolve with evolveAddColumns " +
              "or a full commit first")
          val (entries, dvE) = splitEntries(readManifest(fs, rootP, bv))
          val (touched, untouched) =
            detectTouched(spark, rootP, entries, dvE, keys, batchKeys)
          val touchedRows =
            if (touched.isEmpty) readVersion(spark, root, bv).limit(0)
            else readEntriesWithDv(spark, rootP, touched, dvE)
          // targeted merge: batch keys leave the touched files (the
          // batch's row wins), everything else in them survives; the
          // resolved batch lands as fresh files
          val newData = touchedRows.join(batchKeys, keys, "left_anti")
            .unionByName(resolved)
          val newEntries = writeDataFiles(spark, fs, rootP, newData,
            statsCols, categoryCols, bloomCols, bloomBits)
          // the feed step is batch-scoped: old state of batch keys is
          // exactly the touched files' matched rows (hit detection
          // guarantees no other file holds a batch key); upserts never
          // delete, so diffOf emits insert/update only
          val prevMatched = touchedRows.join(batchKeys, keys, "left_semi")
          Right((untouched ++ dvE ++ newEntries,
            (bv, touched.size, untouched.size,
              () => diffOf(prevMatched, resolved, keys))))
      }
      val (prevV, touchedN, untouchedN, stepThunk) = out
      val v = nv.get
      // base-version data files are immutable and outlive the commit,
      // so evaluating the step lazily here still reads consistent state
      if (trackChanges) recordChangesStep(spark, root, prevV, v, stepThunk())
      (v, touchedN, untouchedN)
    } finally Checkpoints.free(resolved, resolvedIds)
  }

  /** Streaming upsert sink on the snapshot layout — the production
    * scale path [[graft.streaming.EventStreams.upsertSink]]'s scaladoc
    * pointed at: same foreachBatch merge semantics, but each
    * micro-batch COMMITS a snapshot instead of swapping the table
    * directory, so concurrent readers are isolated and history is
    * queryable until vacuumed. Routed through [[upsertTargeted]]:
    * per-trigger cost is O(batch + touched files), never O(table) —
    * a micro-batch sink that rewrote the whole table each trigger
    * would be write-amplification-bound at fact scale.
    *
    * PRECONDITION (inherited from the targeted path, and LOUD): merge
    * keys must be non-null — a micro-batch carrying a null key fails
    * the batch and stops the query, rather than silently duplicating
    * the null-key group. A stream that can emit null keys must filter
    * or repair them before this sink.
    *
    * MAINTENANCE, wired in instead of remembered: every targeted
    * trigger appends fresh files, so a long-running sink fragments the
    * table — `compactEvery` > 0 runs the targeted binpack
    * ([[compactSnapshot]]) after every that-many batches, INSIDE the
    * foreachBatch (the sink is the table's single writer, so the
    * compaction cycle serializes with the upserts for free). On a
    * tracked sink the compaction commit records an EMPTY feed step,
    * keeping the CDC chain gap-free. */
  def upsertSink(stream: DataFrame, root: String, checkpoint: String,
                 keys: Seq[String],
                 tieBreak: Seq[org.apache.spark.sql.Column] = Nil,
                 statsCols: Seq[String] = Nil,
                 trackChanges: Boolean = false,
                 compactEvery: Int = 0,
                 compactTargetBytes: Long = 256L * 1024 * 1024)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertTargeted(batch, root, keys, tieBreak, statsCols,
          trackChanges = trackChanges)
        if (compactEvery > 0 && (id + 1) % compactEvery == 0)
          compactSnapshot(batch.sparkSession, root, compactTargetBytes,
            statsCols, changeKeys = if (trackChanges) keys else Nil)
        ()
      }
      .start()

  /** Row-level DELETE as a COPY-ON-WRITE commit — the
    * right-to-be-forgotten operation every training corpus eventually
    * needs, priced honestly: one scan of the current snapshot finds
    * the files that actually HOLD matching rows, only those are
    * rewritten without them, and every untouched file is referenced
    * verbatim in the new manifest WITH its stats sections preserved
    * (Delta's copy-on-write delete, minus deletion vectors). At
    * 100 TB with the delete key clustered (range/category/z-order
    * layouts this format already records), the rewrite touches the
    * handful of files the key lives in, not the table. A predicate
    * matching nothing publishes nothing. Non-empty `changeKeys`
    * records the deletes in the change feed, so CDC consumers retract
    * downstream state; rewritten files get fresh stats per the
    * `statsCols`/`categoryCols`/`bloomCols` passed here. Returns
    * (version, filesRewritten, filesKeptVerbatim) — version is the
    * PRIOR version when nothing matched. */
  def deleteWhere(spark: SparkSession, root: String,
                  condition: org.apache.spark.sql.Column,
                  changeKeys: Seq[String] = Nil,
                  statsCols: Seq[String] = Nil,
                  categoryCols: Seq[String] = Nil,
                  bloomCols: Seq[String] = Nil,
                  bloomBits: Int = DefaultBloomBits): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    val (fs, rootP) = fsOf(spark, root)
    val (nv, out) = rebaseLoop[(Long, Int, Int)](fs, rootP) { base =>
      val bv = base.getOrElse(throw new IllegalStateException(
        s"SnapshotTable at $root has no committed snapshot to delete from"))
      val (dataE, dvE) = splitEntries(readManifest(fs, rootP, bv))
      // DV-aware source: an already-tombstoned row can neither
      // re-match (touching a file needlessly) nor resurrect into the
      // rewrite. Part-file names carry a UUID, so the base name is a
      // unique key.
      val hit = readWithPos(spark, rootP, dataE, dvE)
        .filter(condition)
        .select(col("__graft_fn"))
        .distinct().collect().map(_.getString(0)).toSet
      val (touched, untouched) =
        dataE.partition(e => hit.contains(new Path(entryPath(e)).getName))
      if (touched.isEmpty) Left((bv, 0, untouched.size))
      else {
        // survivors are the rows where the predicate is NOT TRUE — a
        // row where the condition evaluates to NULL (e.g. a null in
        // the probed column) was not asked to be deleted, and
        // `!condition` would be NULL too, silently dropping it from
        // the rewrite (and the change feed would then propagate that
        // loss to CDC consumers); Delta's copy-on-write delete keeps
        // not-true rows for exactly this reason
        val survivors = readEntriesWithDv(spark, rootP, touched, dvE)
          .filter(!coalesce(condition, lit(false)))
        val newEntries = writeDataFiles(spark, fs, rootP, survivors,
          statsCols, categoryCols, bloomCols, bloomBits)
        // DV entries carry forward verbatim; tombstones naming the
        // rewritten files go stale-but-harmless (those file names left
        // the manifest, the anti-join matches nothing) until a
        // compaction folds everything clean
        Right((untouched ++ dvE ++ newEntries,
          (bv, touched.size, untouched.size)))
      }
    }
    val (bv, touchedN, untouchedN) = out
    nv match {
      case Some(v) =>
        if (changeKeys.nonEmpty) recordChanges(spark, root, Some(bv), v, changeKeys)
        (v, touchedN, untouchedN)
      case None => (bv, touchedN, untouchedN)
    }
  }

  /** Row-level DELETE as MERGE-ON-READ deletion vectors — the
    * complement of [[deleteWhere]]'s copy-on-write for the scattered-
    * delete shape (GDPR keys spread across many fat files), where COW
    * would rewrite a whole file per point delete: NO data file is
    * rewritten at all. Matching rows are recorded as positional
    * tombstones `(file_name, row_index)` in a small parquet sidecar
    * under `_dv/`, referenced by the new manifest like any entry, and
    * every read ([[read]]/[[readVersion]]/[[scanPruned]]*) anti-joins
    * them out (Delta's deletion vectors / Iceberg v2 position deletes,
    * on the house format). The read-side price is one broadcast
    * anti-join per scan until [[compactSnapshot]] folds the tombstones
    * back into clean data files; sidecars accumulate per delete, so
    * compact on the same cadence as small files. Time travel, stats
    * pruning (tombstoned rows only ever OVER-keep a file — the
    * superset contract holds), the validated rebase loop and vacuum
    * all compose unchanged. Rows where `condition` is NULL are kept,
    * like [[deleteWhere]]. Non-empty `changeKeys` records the deleted
    * rows in the change feed from the matched set — O(matched), never
    * a table diff. Returns (version, tombstonedRows, dvFilesAdded) —
    * the PRIOR version and zero counts when nothing matched. */
  def deleteWhereDV(spark: SparkSession, root: String,
                    condition: org.apache.spark.sql.Column,
                    changeKeys: Seq[String] = Nil): (Long, Long, Int) = {
    import org.apache.spark.sql.functions._
    val (fs, rootP) = fsOf(spark, root)
    val (nv, out) =
      rebaseLoop[(Long, Long, Int, () => DataFrame)](fs, rootP) { base =>
        val bv = base.getOrElse(throw new IllegalStateException(
          s"SnapshotTable at $root has no committed snapshot to delete from"))
        val (dataE, dvE) = splitEntries(readManifest(fs, rootP, bv))
        // DV-aware matching: a row already tombstoned cannot be
        // re-deleted (its change-feed row would double-retract)
        val matched = readWithPos(spark, rootP, dataE, dvE)
          .filter(condition)
        // one sidecar file per delete operation: tombstones are tiny
        // (two columns), and the repartition keeps the matching SCAN
        // parallel while collapsing only the small write
        val nonce = java.util.UUID.randomUUID().toString.take(12)
        val staging = new Path(new Path(rootP, StagingDir), s"dv-$nonce")
        matched.select(col("__graft_fn").as("file_name"),
            col("__graft_ri").as("row_index"))
          .repartition(1)
          .write.mode("overwrite").option("compression", "zstd")
          .parquet(staging.toString)
        val n = spark.read.parquet(staging.toString).count()
        if (n == 0L) { fs.delete(staging, true); Left((bv, 0L, 0, null)) }
        else {
          val dvHome = new Path(new Path(rootP, DvDir), nonce)
          fs.mkdirs(dvHome.getParent)
          if (!fs.rename(staging, dvHome))
            sys.error(s"SnapshotTable: could not move staged deletion " +
              s"vector $staging into place at $dvHome")
          val newDv = fs.listStatus(dvHome)
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(st => s"$DvDir/$nonce/${st.getPath.getName}\t!${st.getLen}")
            .sorted.toSeq
          // feed step: the matched rows as deletes — lazy, and still
          // consistent post-commit (base data files are immutable)
          val step = () => {
            val nonKeys = matched.columns
              .filterNot(c => changeKeys.contains(c) ||
                c == "__graft_fn" || c == "__graft_ri").toSeq
            matched.select(changeKeys.map(col) ++
              Seq(lit("delete").as("change")) ++ nonKeys.map(col): _*)
          }
          Right((dataE ++ dvE ++ newDv, (bv, n, newDv.size, step)))
        }
      }
    val (bv, n, dvFiles, stepThunk) = out
    nv match {
      case Some(v) =>
        if (changeKeys.nonEmpty)
          recordChangesStep(spark, root, bv, v, stepThunk())
        (v, n, dvFiles)
      case None => (bv, n, dvFiles)
    }
  }

  /** ROLLBACK as a manifest-only commit — Delta RESTORE / Iceberg
    * rollback on the house format: publish `toVersion`'s manifest
    * lines (data entries, stats sections, deletion vectors — all
    * verbatim) as the NEXT version. No data moves or rewrites: the
    * restored files are immutable and still on disk as long as
    * `toVersion` is retained (vacuum keeps the new tip's references
    * alive from the commit on). History stays append-only — the bad
    * versions remain time-travelable until vacuumed, which is what
    * makes restore auditable instead of destructive. Serializes with
    * concurrent cyclers through the validated publish. Non-empty
    * `changeKeys` records the restore's row-level effect in the
    * change feed (one keyed diff of tip vs target — the honest price
    * of keeping CDC consumers consistent across a rollback; restores
    * are rare). Returns the new version. */
  def restore(spark: SparkSession, root: String, toVersion: Long,
              changeKeys: Seq[String] = Nil): Long = {
    val (fs, rootP) = fsOf(spark, root)
    if (!fs.exists(manifestPath(rootP, toVersion)))
      throw new IllegalStateException(
        s"SnapshotTable at $root has no committed manifest v$toVersion " +
          "to restore (never committed, or vacuumed past)")
    val lines = readManifest(fs, rootP, toVersion)
    val (v, base) = rebaseLoop(fs, rootP) { base =>
      Right((lines, base))
    }
    if (changeKeys.nonEmpty)
      recordChanges(spark, root, base, v.get, changeKeys)
    v.get
  }

  /** Row-level UPDATE as a TARGETED copy-on-write commit — the
    * in-place-repair operation (fix a mislabeled source, bump a
    * schema-stable derived column) priced like [[deleteWhere]]: one
    * DV-aware scan finds the files actually HOLDING rows where
    * `condition` is TRUE, only those are rewritten with each `sets`
    * column replaced by `when(condition, expr).otherwise(old)` — all
    * sets applied in ONE projection against the original row, so the
    * condition and every set's right-hand side see PRE-update values
    * even when they reference another set column (SQL UPDATE
    * semantics) — and every untouched entry is referenced verbatim
    * with stats preserved. `sets` columns must already exist (schema changes go
    * through [[evolveAddColumns]]). NULL-condition rows are left
    * unchanged, like the deletes. Non-empty `changeKeys` records the
    * feed from the touched files' before/after diff — O(touched),
    * never a table join. Returns (version, filesRewritten,
    * filesKeptVerbatim) — the PRIOR version when nothing matched. */
  def updateWhere(spark: SparkSession, root: String,
                  condition: org.apache.spark.sql.Column,
                  sets: Seq[(String, org.apache.spark.sql.Column)],
                  changeKeys: Seq[String] = Nil,
                  statsCols: Seq[String] = Nil,
                  categoryCols: Seq[String] = Nil,
                  bloomCols: Seq[String] = Nil,
                  bloomBits: Int = DefaultBloomBits): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(sets.nonEmpty, "updateWhere: nothing to set")
    require(sets.map(_._1).distinct.size == sets.size,
      s"updateWhere: duplicate set column in " +
        s"(${sets.map(_._1).mkString(",")}) — one expression per column")
    val (fs, rootP) = fsOf(spark, root)
    val (nv, out) =
      rebaseLoop[(Long, Int, Int, () => DataFrame)](fs, rootP) { base =>
        val bv = base.getOrElse(throw new IllegalStateException(
          s"SnapshotTable at $root has no committed snapshot to update"))
        val (dataE, dvE) = splitEntries(readManifest(fs, rootP, bv))
        sets.foreach { case (n, _) =>
          require(
            readVersion(spark, root, bv).columns.contains(n),
            s"updateWhere: column '$n' does not exist — updates never " +
              "change the schema; evolveAddColumns first") }
        val hit = readWithPos(spark, rootP, dataE, dvE)
          .filter(condition)
          .select(col("__graft_fn"))
          .distinct().collect().map(_.getString(0)).toSet
        val (touched, untouched) =
          dataE.partition(e => hit.contains(new Path(entryPath(e)).getName))
        if (touched.isEmpty) Left((bv, 0, untouched.size, null))
        else {
          val oldRows = readEntriesWithDv(spark, rootP, touched, dvE)
          // NOT-TRUE rows pass through unchanged (NULL-safe, like the
          // deletes); TRUE rows get each set column replaced — in ONE
          // projection, so the condition AND every set's right-hand
          // side resolve against the ORIGINAL row (SQL UPDATE
          // semantics). A sequential withColumn chain would re-resolve
          // them against already-updated columns: for
          // SET status='done', ts=x WHERE status='pending', the second
          // withColumn's condition re-reads the REWRITTEN status,
          // evaluates false, and ts silently keeps its old value.
          val setBy = sets.toMap
          val newRows = oldRows.select(oldRows.columns.toSeq.map { c =>
            setBy.get(c) match {
              case Some(e) => when(coalesce(condition, lit(false)), e)
                .otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*)
          val newEntries = writeDataFiles(spark, fs, rootP, newRows,
            statsCols, categoryCols, bloomCols, bloomBits)
          Right((untouched ++ dvE ++ newEntries,
            (bv, touched.size, untouched.size,
              () => diffOf(oldRows, newRows, changeKeys))))
        }
      }
    val (bv, touchedN, untouchedN, stepThunk) = out
    nv match {
      case Some(v) =>
        if (changeKeys.nonEmpty)
          recordChangesStep(spark, root, bv, v, stepThunk())
        (v, touchedN, untouchedN)
      case None => (bv, touchedN, untouchedN)
    }
  }

  /** The newest version committed AT OR BEFORE `asOfMs` — wall-clock
    * time travel over the retained window, resolved from each
    * manifest's modification time (set by the publish rename, the
    * commit's linearization point). Loud when nothing retained is that
    * old: silently answering with a YOUNGER version would misreport
    * history, and the honest answers are "vacuumed past" or "table
    * did not exist yet". */
  def versionAsOf(spark: SparkSession, root: String, asOfMs: Long): Long = {
    val (fs, rootP) = fsOf(spark, root)
    val eligible = versions(spark, root)
      .filter(v => fs.getFileStatus(manifestPath(rootP, v))
        .getModificationTime <= asOfMs)
    if (eligible.isEmpty) throw new IllegalStateException(
      s"SnapshotTable at $root has no retained version committed at or " +
        s"before $asOfMs — vacuumed past, or the table is younger")
    eligible.max
  }

  /** [[readVersion]] at the wall-clock instant `asOfMs`. */
  def readAsOf(spark: SparkSession, root: String, asOfMs: Long): DataFrame =
    readVersion(spark, root, versionAsOf(spark, root, asOfMs))

  /** Operational history — one row per RETAINED version, newest last:
    * (version, committed_at epoch ms from the manifest's mtime,
    * n_files, n_bytes from the manifest's own entries, tracked =
    * whether a change-feed step is stored, tags = comma-joined tag
    * names pinning the version). The format's DESCRIBE HISTORY,
    * assembled from manifests alone — the row count is the retention
    * window, so building it driver-side is bounded by [[vacuum]]'s
    * horizon, never by table size. */
  def history(spark: SparkSession, root: String): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val chg = changeVersions(spark, root).toSet
    val tagByV = tags(spark, root).toSeq.groupBy(_._2)
      .map { case (v, ts) => v -> ts.map(_._1).sorted.mkString(",") }
    val rows = versions(spark, root).map { v =>
      val entries = readManifest(fs, rootP, v)
      val bytes = entries.map(e => entryBytes(e).getOrElse(
        fs.getFileStatus(new Path(rootP, entryPath(e))).getLen)).sum
      org.apache.spark.sql.Row(v,
        fs.getFileStatus(manifestPath(rootP, v)).getModificationTime,
        entries.size, bytes, chg.contains(v), tagByV.getOrElse(v, ""))
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("committed_at",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n_bytes",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("tracked",
          org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("tags",
          org.apache.spark.sql.types.StringType, nullable = false))))
  }

  // --- named refs (tags) ---

  private val RefsDir = "_refs"
  private val RefNameRe = "[A-Za-z0-9._-]+"

  private def refPath(root: Path, name: String): Path =
    new Path(new Path(root, RefsDir), name)

  /** Pin an IMMUTABLE named tag at a committed version — the
    * provenance primitive a training pipeline needs ("the exact corpus
    * model X trained on"): [[vacuum]] keeps tagged versions (manifest,
    * data files, change feed) readable regardless of `keepVersions`,
    * so a tag is a retention lease, not just a name. Tags are
    * WRITE-ONCE (`create(overwrite = false)`, the claim primitive):
    * re-pointing a tag is refused loudly — delete it explicitly with
    * [[dropTag]] if that is really meant. */
  def tag(spark: SparkSession, root: String, name: String,
          version: Long): Unit = {
    require(name.matches(RefNameRe),
      s"tag name '$name' is not $RefNameRe")
    val (fs, rootP) = fsOf(spark, root)
    if (!fs.exists(manifestPath(rootP, version)))
      throw new IllegalStateException(
        s"SnapshotTable at $root has no committed manifest v$version to tag")
    fs.mkdirs(new Path(rootP, RefsDir))
    val out = try fs.create(refPath(rootP, name), false)
      catch { case _: java.io.IOException =>
        sys.error(s"SnapshotTable tag '$name' already exists at $root — " +
          "tags are immutable; dropTag it first if re-pointing is meant")
      }
    try out.write(version.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
  }

  /** All tags, name → version. */
  def tags(spark: SparkSession, root: String): Map[String, Long] = {
    val (fs, rootP) = fsOf(spark, root)
    val rd = new Path(rootP, RefsDir)
    if (!fs.exists(rd)) return Map.empty
    fs.listStatus(rd).iterator.filter(_.isFile).map { st =>
      val in = fs.open(st.getPath)
      try {
        // loop to EOF — a single read() may return short on Hadoop
        // streams, truncating the version string into a wrong parse
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        st.getPath.getName -> new String(bos.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }.toMap
  }

  /** The snapshot a tag pins — loud on an unknown tag. */
  def readTag(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = tags(spark, root).getOrElse(name,
      throw new IllegalStateException(
        s"SnapshotTable at $root has no tag '$name'"))
    readVersion(spark, root, v)
  }

  /** Remove a tag (the version becomes vacuum-eligible again). */
  def dropTag(spark: SparkSession, root: String, name: String): Boolean = {
    val (fs, rootP) = fsOf(spark, root)
    fs.delete(refPath(rootP, name), false)
  }

  /** Apply one CHANGELOG micro-batch to a DERIVED keyed snapshot
    * table — the maintenance step of a CDC-driven MATERIALIZED VIEW,
    * the consumer the `snapshot-changes` stream exists for: `changes`
    * carries `(keys..., change, source-cols..., version)` rows (the
    * stored feed's shape); `transform` maps the surviving source rows
    * to the view's rows (e.g. recompute an embedding). Per key, the
    * batch's HIGHEST version wins (a micro-batch may carry several
    * commits' steps for one key — only the net state matters);
    * insert/update keys are re-derived through `transform`, delete
    * keys leave the view. Idempotent in content: re-delivering a batch
    * (foreachBatch's at-least-once crash replay) publishes a new
    * version with IDENTICAL rows (the re-delivered keys' files
    * rewrite again, to the same content).
    *
    * Scale shape — [[upsertTargeted]]'s discipline, NOT a view
    * rewrite: one keyed dedup of the (small) batch, then hit-detect
    * the view files actually HOLDING batch keys (manifest range +
    * Bloom pre-prune, column-pruned DV-aware key scan semi-joined
    * against the batch keys), COW-rewrite ONLY those files with the
    * batch keys removed (feed deletes never return, upserts come back
    * re-derived as fresh rows in the rewrite), and reference every
    * other entry VERBATIM with its stats preserved. Per trigger the
    * maintained view pays O(batch + touched files), never O(view) —
    * a 1k-row feed step against a 100 TB derived view touches the
    * handful of files its keys live in. Give the view layout on the
    * key (`statsCols`/`bloomCols` on it) and the hit detection is
    * sublinear in FILES too, not just bytes.
    *
    * Returns (version, filesRewritten, filesKeptVerbatim). */
  def applyChangesCycle(changes: DataFrame, root: String,
                        keys: Seq[String],
                        derive: DataFrame => DataFrame,
                        statsCols: Seq[String] = Nil,
                        categoryCols: Seq[String] = Nil,
                        bloomCols: Seq[String] = Nil,
                        bloomBits: Int = DefaultBloomBits): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    val spark = changes.sparkSession
    // net state per key ONCE, outside the rebase loop; checkpointed —
    // the cycle evaluates it several times (key guard, hit join per
    // rebase, the derive under the data write), and the feed step may
    // carry expensive lineage
    val (net, netIds) = Checkpoints.eager(
      graft.operators.Components.mergeFirstWriterWins(
        Seq(changes), keys, Seq(col("version") * -1)))
    try {
      // the keyed-table contract, loud like upsertTargeted's: a NULL
      // key would bypass the semi/anti joins (SQL null never equals)
      // and strand stale view rows instead of replacing them
      require(net.filter(
          keys.map(col(_).isNull).reduce(_ || _)).limit(1).isEmpty,
        s"applyChangesCycle: feed batch carries NULL in a key " +
          s"(${keys.mkString(",")}) — keyed views require non-null keys")
      val ups = derive(net.filter(col("change") =!= "delete")
        .drop("change", "version"))
      val batchKeys = net.select(keys.map(col): _*).distinct()
      val (fs, rootP) = fsOf(spark, root)
      val (v, out) = rebaseLoop[(Int, Int)](fs, rootP) { base =>
        // stats/category/bloom sections recorded per cycle, so the
        // CDC-maintained view prunes like any hand-committed table —
        // no dedicated stats pass needed downstream
        base match {
          case Some(bv) =>
            val (entries, dvE) = splitEntries(readManifest(fs, rootP, bv))
            val (touched, untouched) =
              detectTouched(spark, rootP, entries, dvE, keys, batchKeys)
            val touchedRows =
              if (touched.isEmpty) readVersion(spark, root, bv).limit(0)
              else readEntriesWithDv(spark, rootP, touched, dvE)
            // drop EVERY batch key from the touched files (deletes
            // never return, upserts come back re-derived), keep the
            // files' other rows; untouched entries never move
            val merged = touchedRows
              .join(batchKeys, keys, "left_anti")
              .unionByName(ups)
            val newEntries = writeDataFiles(spark, fs, rootP, merged,
              statsCols, categoryCols, bloomCols, bloomBits)
            Right((untouched ++ dvE ++ newEntries,
              (touched.size, untouched.size)))
          case None =>
            Right((writeDataFiles(spark, fs, rootP, ups, statsCols,
              categoryCols, bloomCols, bloomBits), (0, 0)))
        }
      }
      (v.get, out._1, out._2)
    } finally Checkpoints.free(net, netIds)
  }

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
                     colA: String, colB: String, nFiles: Int = 64,
                     categoryCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.col
    val laid = df.withColumn("__zkey",
        graft.plans.LayoutExpressions.zorder_key(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
    // categoryCols: a z-ordered corpus usually ALSO carries
    // low-cardinality slice columns (lang, source) that correlate with
    // the layout key — recording their per-file sets lets
    // [[scanPrunedEq]] equality-prune the same files the range stats
    // already bound
    commit(spark, root, laid, statsCols = Seq(colA, colB),
      categoryCols = categoryCols)
  }

  /** TARGETED small-file compaction AS A COMMIT (Iceberg's
    * rewrite-data-files binpack on the house format): rewrite ONLY
    * (a) files carrying LIVE deletion-vector tombstones — folding the
    * tombstones into clean data — and (b) under-threshold files
    * (< 3/4 of `targetFileBytes`, binpacked together into
    * ceil(bytes / targetFileBytes) outputs via coalesce, a NARROW
    * repartitioning); every already-compact clean file is referenced
    * VERBATIM with its stats sections preserved. A full-table rewrite
    * here would make [[deleteWhereDV]]'s zero-rewrite promise a
    * deferred O(table) cost — one small tombstone sidecar must only
    * ever rewrite the files it actually names. Compaction is just
    * another snapshot: readers pinned on the fragmented version
    * finish unaffected, and vacuum reclaims it once it leaves the
    * retained window. The committed manifest drops ALL sidecar
    * entries — every live tombstone's file is in the rewrite set by
    * construction, so surviving sidecars would be stale; a manifest
    * whose sidecars are ALL stale already (their files left via
    * [[deleteWhere]]/[[upsertTargeted]] rewrites) publishes a
    * MANIFEST-ONLY commit shedding them. No-op (returns None) when
    * there is nothing to fold and fewer than two under-threshold
    * files. Incremental sinks NEED this: every upsert/append cycle
    * adds files, and at 100 TB the task-per-tiny-file overhead
    * dominates scans. `statsCols` records pruning stats for the
    * rewritten files (merged files span wider ranges — re-recording
    * keeps [[scanPruned]] honest; untouched files keep the stats they
    * had). On a TRACKED table pass `changeKeys` so the published
    * commit records an EMPTY feed step (compaction changes no rows)
    * instead of an absent one — an absent step is a chain GAP that
    * fails CDC consumers loudly by design. Returns
    * Some((version, filesRewritten, filesKeptVerbatim)) when a commit
    * published. */
  def compactSnapshot(spark: SparkSession, root: String,
                      targetFileBytes: Long = 256L * 1024 * 1024,
                      statsCols: Seq[String] = Nil,
                      changeKeys: Seq[String] = Nil)
      : Option[(Long, Int, Int)] = {
    require(targetFileBytes >= 1L, "targetFileBytes must be >= 1")
    val (fs, rootP) = fsOf(spark, root)
    val (v, out) = rebaseLoop[(Int, Int)](fs, rootP) { base =>
      val bv = base.getOrElse(throw new IllegalStateException(
        s"SnapshotTable at $root has no committed snapshot to compact"))
      val (dataE, dvE) = splitEntries(readManifest(fs, rootP, bv))
      // LIVE tombstoned files: sidecar-named files still in the
      // manifest (a rewrite by deleteWhere/upsertTargeted leaves a
      // sidecar's names stale-but-harmless — those must not force
      // anything). The sidecars are tiny; collecting their distinct
      // file names is bounded by the delete volume, never the table.
      val dvHit: Set[String] =
        if (dvE.isEmpty) Set.empty
        else {
          val present = dataE.map(e => new Path(entryPath(e)).getName).toSet
          spark.read.parquet(
              dvE.map(e => new Path(rootP, entryPath(e)).toString): _*)
            .select("file_name").distinct().collect()
            .map(_.getString(0)).toSet.intersect(present)
        }
      // binpack split: DV-bearing files rewrite regardless of size
      // (folding is the point); clean files rewrite only when under
      // 3/4 of target (Iceberg's min-file-size default) AND there are
      // at least two of them to merge
      val minBytes = targetFileBytes - targetFileBytes / 4
      // recorded sizes when present (manifest-only planning — no
      // per-file filesystem sweep), getFileStatus only for pre-size
      // manifests
      val sized = dataE.map(e => e -> entryBytes(e).getOrElse(
        fs.getFileStatus(new Path(rootP, entryPath(e))).getLen))
      val (small, fat) = sized.partition { case (e, len) =>
        dvHit.contains(new Path(entryPath(e)).getName) || len < minBytes
      }
      if (dvHit.isEmpty && small.size < 2) {
        // nothing to fold or merge; shed all-stale sidecars with a
        // manifest-only commit so reads stop paying their anti-join
        if (dvE.nonEmpty) Right((dataE, (0, dataE.size)))
        else Left((0, dataE.size))
      } else {
        val touched = small.map(_._1)
        val untouched = fat.map(_._1)
        val want = math.max(1, math.ceil(
          small.map(_._2).sum.toDouble / targetFileBytes).toInt)
        val folded = readEntriesWithDv(spark, rootP, touched, dvE)
          .coalesce(want)
        val newEntries = writeDataFiles(spark, fs, rootP, folded, statsCols)
        Right((untouched ++ newEntries, (touched.size, untouched.size)))
      }
    }
    // a TRACKED table's compaction must keep the change chain
    // unbroken: the commit changes no rows, so its feed step is EMPTY
    // — schema-shaped, zero rows — rather than absent (an absent step
    // is a chain GAP that fails every CDC consumer loudly, by design)
    v.foreach { ver =>
      if (changeKeys.nonEmpty) {
        import org.apache.spark.sql.functions._
        val cur = readVersion(spark, root, ver)
        val nonKeys = cur.columns.filterNot(changeKeys.contains).toSeq
        recordChangesStep(spark, root, ver - 1, ver,
          cur.limit(0).select(changeKeys.map(col) ++
            Seq(lit("insert").as("change")) ++ nonKeys.map(col): _*))
      }
    }
    v.map(ver => (ver, out._1, out._2))
  }

  /** Can a file possibly hold rows matching `filter`? — the
    * Catalyst-filter twin of the scanPruned* family, evaluated against
    * ONE manifest entry's recorded sections, used by
    * [[graft.sources.SnapshotFileIndex]] to turn Spark's pushed-down
    * data filters into file skipping with no explicit scanPruned call.
    * Strictly a SUPERSET decision (`true` = keep): untranslatable
    * shapes, columns without sections, and non-integral literals all
    * keep the file — Spark still applies the row filter on top, so a
    * kept-too-much file costs a file open, never a wrong row.
    *
    * Translated shapes: `=`/`<=>` (range ∩ category ∩ bloom — the
    * category/bloom probe uses the literal's `cast("string")` form,
    * matching what the writer hashed), `<`,`<=`,`>`,`>=` on integral
    * literals (recorded long ranges), `IN` (any value may match),
    * `AND` (both sides must keep), `OR` (either side keeps). `NOT`
    * and everything else keep unconditionally. */
  private[graft] def entryMayMatch(entry: String,
      filter: org.apache.spark.sql.catalyst.expressions.Expression)
      : Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    // the literal's long value when exact (integral types only — a
    // double's truncation under try_cast is sound for equality but
    // subtle for open ranges; keep is always safe, so keep)
    def asLong(l: Literal): Option[Long] = l.dataType match {
      case ByteType => Some(l.value.asInstanceOf[Byte].toLong)
      case ShortType => Some(l.value.asInstanceOf[Short].toLong)
      case IntegerType => Some(l.value.asInstanceOf[Int].toLong)
      case LongType => Some(l.value.asInstanceOf[Long])
      case StringType =>
        val s = l.value.toString
        if (s.matches("-?\\d{1,18}")) Some(s.toLong) else None
      case _ => None
    }
    // the literal in the writer's category/bloom hash form
    // (`col.cast("string")`); None for types whose cast form we do
    // not reproduce byte-exactly (float/double/date/timestamp)
    def asString(l: Literal): Option[String] = l.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType |
           BooleanType =>
        Option(l.value).map(_.toString)
      case _ => None
    }
    def eqKeep(name: String, l: Literal): Boolean = {
      if (l.value == null) return true // null-safe-eq-null: stats blind
      val rangeKeep = asLong(l) match {
        case Some(v) => entryStats(entry).get(name) match {
          case Some((mn, mx)) => mx.forall(_ >= v) && mn.forall(_ <= v)
          case None => true
        }
        case None => true
      }
      val catKeep = asString(l) match {
        case Some(s) => entryCategories(entry).get(name) match {
          case Some(vs) => vs.contains(s)
          case None => true
        }
        case None => true
      }
      val bloomKeep = asString(l) match {
        case Some(s) => entryBlooms(entry).get(name) match {
          case Some((m, k, bits)) => bloomBitsOf(s, m, k).forall(bits.get)
          case None => true
        }
        case None => true
      }
      rangeKeep && catKeep && bloomKeep
    }
    def rangeKeep(name: String, lo: Option[Long], hi: Option[Long])
        : Boolean =
      entryStats(entry).get(name) match {
        case Some((mn, mx)) =>
          lo.forall(l => mx.forall(_ >= l)) &&
            hi.forall(h => mn.forall(_ <= h))
        case None => true
      }
    filter match {
      case And(l, r) => entryMayMatch(entry, l) && entryMayMatch(entry, r)
      case Or(l, r) => entryMayMatch(entry, l) || entryMayMatch(entry, r)
      case EqualTo(a: AttributeReference, l: Literal) => eqKeep(a.name, l)
      case EqualTo(l: Literal, a: AttributeReference) => eqKeep(a.name, l)
      case EqualNullSafe(a: AttributeReference, l: Literal) => eqKeep(a.name, l)
      case EqualNullSafe(l: Literal, a: AttributeReference) => eqKeep(a.name, l)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        asLong(l).forall(v => rangeKeep(a.name, Some(v + 1), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        asLong(l).forall(v => rangeKeep(a.name, Some(v), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        asLong(l).forall(v => rangeKeep(a.name, None, Some(v - 1)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        asLong(l).forall(v => rangeKeep(a.name, None, Some(v)))
      // literal-on-the-left comparisons, mirrored
      case GreaterThan(l: Literal, a: AttributeReference) =>
        asLong(l).forall(v => rangeKeep(a.name, None, Some(v - 1)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        asLong(l).forall(v => rangeKeep(a.name, None, Some(v)))
      case LessThan(l: Literal, a: AttributeReference) =>
        asLong(l).forall(v => rangeKeep(a.name, Some(v + 1), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        asLong(l).forall(v => rangeKeep(a.name, Some(v), None))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.isEmpty || vs.exists(v => eqKeep(a.name, v.asInstanceOf[Literal]))
      // the optimizer rewrites IN lists past
      // spark.sql.optimizer.inSetConversionThreshold (default 10) to
      // InSet over INTERNAL values — re-wrap them as typed literals
      // so a 50-key lookup still prunes
      case InSet(a: AttributeReference, hset) =>
        hset.isEmpty ||
          hset.exists(v => eqKeep(a.name, Literal(v, a.dataType)))
      case _ => true
    }
  }

  /** Root-relative DATA-file paths of the current snapshot's manifest
    * — the file-level observability API (Delta's DESCRIBE DETAIL /
    * `inputFiles` idea), resolved from the manifest WITHOUT planning a
    * scan: usable while deletion vectors are live, where
    * `input_file_name()` is unavailable on the joined read plan
    * (Spark refuses the expression over multi-source plans). The
    * verbatim-reference proofs (which files survived a targeted
    * rewrite) read THIS, not the scan. */
  def dataFiles(spark: SparkSession, root: String): Seq[String] = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    splitEntries(readManifest(fs, rootP, v))._1.map(entryPath)
  }

  /** Deletion-vector sidecar FILES the current snapshot references —
    * the read-amplification meter for [[deleteWhereDV]]: every scan
    * pays one anti-join while any sidecar is live, and each delete
    * operation adds one more, so the count is the policy knob
    * [[compactIfDvHeavy]] bounds. */
  def dvFileCount(spark: SparkSession, root: String): Int = {
    val (fs, rootP) = fsOf(spark, root)
    val v = currentVersion(fs, rootP).getOrElse(throw new IllegalStateException(
      s"SnapshotTable at $root has no committed snapshot"))
    splitEntries(readManifest(fs, rootP, v))._2.size
  }

  /** Policy hook bounding [[deleteWhereDV]]'s read amplification: run
    * [[compactSnapshot]] iff the current snapshot references MORE than
    * `maxDvFiles` sidecar files — the scheduled-maintenance shape
    * (call it after each delete, or on the vacuum cadence) that keeps
    * the per-scan anti-join cost bounded by POLICY instead of operator
    * discipline. With the targeted binpack underneath, the triggered
    * pass rewrites only the tombstoned and under-threshold files,
    * never the table. Returns None when under the bound or when
    * compaction had nothing to do. */
  def compactIfDvHeavy(spark: SparkSession, root: String,
                       maxDvFiles: Int = 8,
                       targetFileBytes: Long = 256L * 1024 * 1024,
                       statsCols: Seq[String] = Nil,
                       changeKeys: Seq[String] = Nil)
      : Option[(Long, Int, Int)] = {
    require(maxDvFiles >= 0, "maxDvFiles must be >= 0")
    if (dvFileCount(spark, root) <= maxDvFiles) None
    else compactSnapshot(spark, root, targetFileBytes, statsCols,
      changeKeys)
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
    val a = readVersion(spark, root, vFrom)
    val b = readVersion(spark, root, vTo)
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"SnapshotTable.diff: schema changed between v$vFrom " +
        s"(${a.columns.sorted.mkString(",")}) and v$vTo " +
        s"(${b.columns.sorted.mkString(",")}) — diff a compatible pair " +
        "or migrate first")
    diffOf(a, b, keys)
  }

  /** [[diff]]'s frame-level core — the keyed insert/update/delete
    * changelog from `a` to `b`, for callers that already hold the two
    * states (e.g. [[upsertTargeted]]'s batch-scoped step, where `a` is
    * only the touched files' matched rows, never the table). */
  private def diffOf(a: DataFrame, b: DataFrame, keys: Seq[String])
      : DataFrame = {
    import org.apache.spark.sql.functions._
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

  // --- stored change feed (CDC) ---

  private def changesPath(root: Path, v: Long): Path =
    new Path(new Path(root, ChangesDir), f"v$v%09d.changes")

  /** Store the row-level changelog of commit `v` (diffed against the
    * version that was current when the commit started, or the full
    * state as `insert` rows for a table's FIRST commit) under
    * `_changes/v%09d.changes` — Delta's change-data-feed idea on the
    * house manifest format: the feed is computed ONCE at commit time
    * (the upsert cycle already paid the keyed read of the prior
    * version) and consumers read parquet files, never re-join
    * snapshots. A `_from-<v>` marker records the predecessor so
    * consumers can verify the feed is GAP-FREE (see
    * [[verifyChangeChain]]); files starting with `_` are invisible to
    * parquet reads. Written staging-first then renamed — a crash
    * between manifest publish and feed rename leaves a chain gap that
    * fails consumers loudly, never a torn feed. */
  private def recordChanges(spark: SparkSession, root: String,
                            prev: Option[Long], v: Long,
                            keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val step = prev match {
      case Some(p) => diff(spark, root, p, v, keys)
      case None =>
        val full = readVersion(spark, root, v)
        val nonKeys = full.columns.filterNot(keys.contains).toSeq
        full.select(keys.map(col) ++ Seq(lit("insert").as("change")) ++
          nonKeys.map(col): _*)
    }
    recordChangesStep(spark, root, prev.getOrElse(0L), v, step)
  }

  /** Store a PRECOMPUTED changelog step for commit `v` (diffed against
    * `prevV`) — [[recordChanges]]' core, taken directly by callers
    * that already know their change set ([[upsertTargeted]]'s step is
    * O(batch + touched files), and re-deriving it through [[diff]]'s
    * full-outer table join would reinstate exactly the O(table) read
    * the targeted path exists to avoid). `step` must carry the feed
    * shape `(keys..., change, non-keys...)`. */
  private def recordChangesStep(spark: SparkSession, root: String,
                                prevV: Long, v: Long,
                                step: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val (fs, rootP) = fsOf(spark, root)
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val staging = new Path(new Path(rootP, StagingDir), s"chg-$nonce")
    step.withColumn("version", lit(v))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(staging.toString)
    fs.create(new Path(staging, s"_from-$prevV"), true).close()
    val target = changesPath(rootP, v)
    fs.mkdirs(target.getParent)
    if (!fs.rename(staging, target))
      sys.error(s"SnapshotTable: could not move the staged change feed " +
        s"$staging into place at $target")
  }

  /** Versions with a STORED change feed, ascending. */
  def changeVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, rootP) = fsOf(spark, root)
    val cd = new Path(rootP, ChangesDir)
    if (!fs.exists(cd)) return Nil
    fs.listStatus(cd).iterator.flatMap { st =>
      st.getPath.getName match {
        case ChangesRe(d) => Some(d.toLong)
        case _ => None
      }
    }.toSeq.sorted
  }

  /** The predecessor version change feed `v` was diffed against (0 for
    * a table's bootstrap feed). */
  private def changeFrom(fs: FileSystem, rootP: Path, v: Long): Long = {
    val dir = changesPath(rootP, v)
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collectFirst { case n if n.startsWith("_from-") =>
        n.stripPrefix("_from-").toLong }
      .getOrElse(sys.error(
        s"SnapshotTable: change feed $dir has no _from marker — " +
          "externally tampered or written by an incompatible version"))
  }

  /** Prove the stored feed steps `needed` (ascending) form an unbroken
    * predecessor chain starting exactly at `since` — LOUD otherwise.
    * This is what makes the feed trustworthy: an UNTRACKED commit in
    * the middle (its successor's `_from` skips a version the consumer
    * never saw) and a feed step VACUUMED from under a slow consumer
    * both break the chain, and both must force a re-bootstrap from
    * [[read]] instead of a silent gap. */
  private[graft] def verifyChangeChain(spark: SparkSession, root: String,
                                       since: Long,
                                       needed: Seq[Long]): Unit = {
    val (fs, rootP) = fsOf(spark, root)
    var at = since
    needed.foreach { v =>
      val f = changeFrom(fs, rootP, v)
      if (f != at) sys.error(
        s"SnapshotTable change feed at $root has a GAP: step v$v was " +
          s"diffed against v$f but the consumer is at v$at — either a " +
          "commit landed without change tracking or vacuum reclaimed " +
          "part of the feed; re-bootstrap from read()")
      at = v
    }
  }

  /** Batch read of the STORED change feed strictly after
    * `sinceVersion` (0 = from the table's bootstrap feed): the
    * concatenated per-commit changelogs, `(keys..., change,
    * non-keys..., version)`, chain-verified gap-free. This is
    * [[changesSince]]'s stored twin — same rows when every commit was
    * tracked, but read as plain parquet files instead of re-joining
    * retained snapshots, which is what a CONTINUOUS consumer (the
    * streaming `snapshot-changes` source) needs: per-trigger cost is
    * O(changed rows), not O(table). */
  def readChanges(spark: SparkSession, root: String,
                  sinceVersion: Long): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val all = changeVersions(spark, root)
    require(all.nonEmpty,
      s"SnapshotTable at $root has no stored change feed — commit with " +
        "changeKeys / trackChanges to record one")
    val needed = all.filter(_ > sinceVersion)
    verifyChangeChain(spark, root, sinceVersion, needed)
    if (needed.isEmpty)
      spark.read.parquet(changesPath(rootP, all.last).toString).limit(0)
    else
      spark.read.parquet(needed.map(changesPath(rootP, _).toString): _*)
  }

  /** Reclaim space: keep the newest `keepVersions` manifests PLUS
    * every [[tag]]ged version (a tag is a retention lease), delete
    * other manifests (and their lock files and stored change feeds),
    * every data file no retained manifest references, and staging/temp
    * orphans (crashed commits) OLDER than `stagingGraceMs`. Readers
    * pinned inside the retained window are unaffected; `keepVersions`
    * is the table's read-transaction horizon, and it bounds the change
    * feed too — a CDC consumer further behind than the window fails
    * the chain check loudly ([[verifyChangeChain]]).
    *
    * WRITER-EXCLUSIVE, named: the staging sweep cannot tell a crashed
    * commit's orphan from a LIVE committer's in-flight write, so run
    * vacuum from the table's (single) writer between its own commits —
    * a victim committer fails loudly at its staging rename (nothing
    * tears), but that failure is an operational foot-gun, not a
    * feature. The grace window de-fangs it: a staging entry — and an
    * UNREFERENCED `data/`/`_dv/` nonce dir, which an in-flight commit
    * renames into place BEFORE its manifest publishes (and may hold
    * there through the rebase/stale-claim wait) — younger than
    * `stagingGraceMs` (default 24 h — longer than any sane commit)
    * survives the sweep, so a mistimed vacuum can only reclaim writes
    * that are already dead; reclaiming a just-vacuumed version's data
    * is merely DEFERRED to the next sweep past the grace. Lock files ABOVE the committed tip
    * are kept unconditionally — they are live or crashed CLAIMS, and
    * deleting a live one would re-arm the very version collision the
    * claim protocol exists to prevent (a crashed claim is one 0-byte
    * file and a version-number hole; both are harmless).
    * Returns (manifestsDeleted, dataDirsDeleted). */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
             stagingGraceMs: Long = 24L * 3600 * 1000)
      : (Int, Int) = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    require(stagingGraceMs >= 0, "stagingGraceMs must be >= 0")
    val (fs, rootP) = fsOf(spark, root)
    val all = versions(spark, root)
    val keep = all.takeRight(keepVersions).toSet ++
      tags(spark, root).values.filter(all.contains)
    val tip = if (all.isEmpty) 0L else all.max
    val referenced: Set[String] =
      keep.flatMap(readManifest(fs, rootP, _).map(entryPath))
    val sweepNow = System.currentTimeMillis()
    // nonce-directory granularity: a data dir goes when NONE of its
    // files is referenced by a retained manifest (files of one commit
    // share a manifest's fate, so partial references cannot happen).
    // The grace window applies HERE too, not just to _staging: a
    // committer renames its data (and [[deleteWhereDV]] its sidecar)
    // into place BEFORE publishing the manifest — and may sit in the
    // rebase/stale-claim wait for seconds — so an unreferenced nonce
    // dir younger than the grace can be an in-flight commit, and
    // deleting it would leave the about-to-publish manifest pointing
    // at missing files. Older unreferenced dirs are genuinely dead
    // (crashed or vacuumed-past commits).
    val dataHome = new Path(rootP, DataDir)
    var dirsDeleted = 0
    if (fs.exists(dataHome)) fs.listStatus(dataHome).foreach { st =>
      val nonce = st.getPath.getName
      if (!referenced.exists(_.startsWith(s"$DataDir/$nonce/")) &&
          sweepNow - st.getModificationTime > stagingGraceMs) {
        fs.delete(st.getPath, true); dirsDeleted += 1
      }
    }
    // deletion-vector sidecars sweep by the same nonce-directory rule
    val dvHome = new Path(rootP, DvDir)
    if (fs.exists(dvHome)) fs.listStatus(dvHome).foreach { st =>
      val nonce = st.getPath.getName
      if (!referenced.exists(_.startsWith(s"$DvDir/$nonce/")) &&
          sweepNow - st.getModificationTime > stagingGraceMs) {
        fs.delete(st.getPath, true); dirsDeleted += 1
      }
    }
    var manifestsDeleted = 0
    val md = new Path(rootP, ManifestDir)
    if (fs.exists(md)) fs.listStatus(md).foreach { st =>
      st.getPath.getName match {
        case ManifestRe(d) if !keep.contains(d.toLong) =>
          fs.delete(st.getPath, false); manifestsDeleted += 1
        // locks at or below the tip are spent (publish only ever
        // claims ABOVE the tip, so none of these can be re-granted);
        // locks above the tip are claims — see the scaladoc
        case LockRe(d) if d.toLong <= tip && !keep.contains(d.toLong) =>
          fs.delete(st.getPath, false)
        case n if n.startsWith(".tmp-") =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
    val cd = new Path(rootP, ChangesDir)
    if (fs.exists(cd)) fs.listStatus(cd).foreach { st =>
      st.getPath.getName match {
        case ChangesRe(d) if !keep.contains(d.toLong) =>
          fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    val sd = new Path(rootP, StagingDir)
    if (fs.exists(sd)) {
      fs.listStatus(sd).foreach { st =>
        if (sweepNow - st.getModificationTime > stagingGraceMs)
          fs.delete(st.getPath, true)
      }
    }
    (manifestsDeleted, dirsDeleted)
  }
}
