package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.core.SnapshotTable

/** Transparent data skipping via the manifest-backed FileIndex
  * ([[graft.sources.SnapshotFileIndex]]): plain `.filter(...)` on
  * `SnapshotTable.table` must open ONLY the files whose recorded
  * sections admit the predicate — proven through the executed scan's
  * `numFiles` metric, not row counts (parquet row-group pruning hides
  * unskipped files from row-level evidence). */
class SnapshotFileIndexSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapidx_spec").toString + "/t"

  /** Files the executed plan's parquet scan actually selected. The
    * queries here are scan+filter+collect (no exchange), so AQE never
    * wraps the plan and the scan node is directly collectible. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("range + bloom sections prune through pushed-down filters: " +
      "equality, open ranges, IN, OR — all with row-identical results") {
    val root = freshRoot()
    SnapshotTable.commit(spark, root,
      spark.range(0L, 400L).selectExpr("id as k", "md5(concat('v', id)) as v")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val t = SnapshotTable.table(spark, root)
    assert(scannedFiles(t) == 4L) // no filter: every file

    def check(cond: org.apache.spark.sql.Column, maxFiles: Long): Unit = {
      val pruned = t.filter(cond)
      val n = scannedFiles(pruned)
      assert(n <= maxFiles, s"expected <= $maxFiles files for $cond, " +
        s"scanned $n")
      val got = pruned.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = SnapshotTable.read(spark, root).filter(cond)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want, s"pruned scan diverged for $cond")
    }
    check(col("k") === 37L, 1)
    check(col("k") === 37L && col("v").isNotNull, 1) // AND composes
    check(col("k") > 390L, 1)
    check(col("k") <= 9L, 1)
    check(col("k").between(150L, 170L), 2)
    check(col("k") === 5L || col("k") === 395L, 2) // OR unions keeps
    check(col("k").isin(5L, 205L), 2)
    // a 12-element IN converts to InSet (threshold 10) — still pruned
    check(col("k").isin(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L,
      11L, 12L), 1)
    // untranslatable predicate: every file kept, result still exact
    check(col("v").startsWith("a"), 4)
    // absent key: bloom prunes everything — zero files, empty result
    val none = t.filter(col("k") === 100000L)
    assert(scannedFiles(none) == 0L)
    assert(none.count() == 0L)
  }

  test("category sections prune string equality transparently; an " +
      "absent value scans zero files") {
    val root = freshRoot()
    SnapshotTable.commit(spark, root,
      spark.range(0L, 400L).selectExpr("id as k",
          "concat('g', id % 4) as g")
        .repartition(4, col("g")),
      categoryCols = Seq("g"))
    val t = SnapshotTable.table(spark, root)
    val total = scannedFiles(t)
    val one = t.filter(col("g") === "g2")
    val n = scannedFiles(one)
    assert(n < total, s"category pruning never engaged: $n of $total")
    assert(one.count() == 100L)
    assert(scannedFiles(t.filter(col("g") === "nope")) == 0L)
  }

  test("a live deletion vector falls back to the MOR read path — " +
      "row-identical, tombstones applied") {
    val root = freshRoot()
    SnapshotTable.commit(spark, root,
      spark.range(0L, 100L).selectExpr("id as k", "concat('v', id) as v")
        .repartitionByRange(4, col("k")), statsCols = Seq("k"))
    SnapshotTable.deleteWhereDV(spark, root, col("k") === 7L)
    val t = SnapshotTable.table(spark, root)
    assert(t.count() == 99L, "the fallback must apply the tombstones")
    assert(t.filter(col("k") === 7L).count() == 0L)
    // after compaction folds the DV, transparent pruning returns
    SnapshotTable.compactSnapshot(spark, root,
      targetFileBytes = 1L, statsCols = Seq("k"))
    assert(SnapshotTable.dvFileCount(spark, root) == 0)
    val t2 = SnapshotTable.table(spark, root)
    assert(t2.count() == 99L)
    assert(scannedFiles(t2.filter(col("k") === 50L)) <
      scannedFiles(t2))
  }
}
