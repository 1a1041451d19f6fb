package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.Config.PipelineSpec
import graft.sources.{Listing, RawTable}

/** The reference's pipeline driver re-expressed Spark-first (reference:
  * `Main` → FetchVersions → Sync → SqlLoad → Compress,
  * `bin/fetcher.bash:13-24`).
  *
  * Key architectural inversion: the reference *generates a script* (the
  * sqlite dot-command program is its physical plan) and executes it
  * sequentially file-by-file; here each stage just composes lazy
  * DataFrames and Catalyst compiles the physical plan. Nothing is
  * materialized driver-side; each `saveAsTable` is one distributed job.
  *
  *  - Fetch/Sync collapse into driver-side file planning
  *    ([[Listing.planFiles]]): we read objects in place rather than
  *    copying them (at 100 TB, sync-to-local is the thing to avoid; a
  *    Hadoop-FS `s3a://` URI scheme makes "remote" transparent).
  *  - SqlLoad becomes per-file [[RawTable.load]] → per-cycle database
  *    tables (parquet via `saveAsTable`, SaveMode.Overwrite = the
  *    reference's drop-and-recreate-DB semantics, D2).
  *  - Compress becomes [[Components.conform]] + [[Components.merge]]
  *    per (compressor, component) over the tables matching the
  *    compressor's include regexes (F4).
  *
  * Stage-skip flags mirror O3 (`FETCHER_SKIP_*`); the reference ships
  * with Compress hardcoded off (`bin/fetcher.bash:12`) but we treat it
  * as first-class since it is the whole relational surface.
  */
object Pipeline {

  final case class Stages(load: Boolean = true, compress: Boolean = true)

  final case class Result(
      group: String,
      database: String,
      tables: Map[String, DataFrame],
      components: Map[String, DataFrame])

  private def dbName(group: String): String =
    group.toLowerCase.replaceAll("[^a-z0-9_]", "_")

  /** Run a group's pipeline: plan files per bucket (include regexes
    * applied pre-scan), load each file as an all-string table, then
    * build deduplicated component tables per compressor. When
    * `persist` is set, tables land in a per-group database (the
    * reference's one-SQLite-DB-per-group). */
  def run(spark: SparkSession, spec: PipelineSpec, group: String,
          bucketRoots: Map[String, String], stages: Stages = Stages(),
          persist: Boolean = false): Result = {
    val db = dbName(group)
    if (persist) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    }

    // Fetch + Sync ≈ pre-scan file planning with the group's include regexes.
    val buckets = spec.fetch.getOrElse(group, Map.empty)
    val planned: Seq[String] = buckets.toSeq.sortBy(_._1).flatMap {
      case (bucket, fetchSpec) =>
        bucketRoots.get(bucket).toSeq.flatMap { root =>
          Listing.planFiles(spark, root, fetchSpec.include.map(_.r))
        }
    }

    // SqlLoad: file → all-string table (name = lowercased basename).
    val tables: Map[String, DataFrame] =
      if (!stages.load) Map.empty
      else planned.map { path =>
        val (name, df) = RawTable.load(spark, path)
        if (persist)
          df.write.mode(SaveMode.Overwrite).saveAsTable(s"$db.$name")
        name -> df
      }.toMap

    // Compress: conformance-union-dedup component tables. Different
    // compressors (one per source shape, like the reference's
    // a_vr_snapshot vs a_ncvoter) feed the SAME component table — the
    // reference's per-statement INSERT OR IGNORE loop becomes one
    // merge over every conformed source of that component.
    val components: Map[String, DataFrame] =
      if (!stages.compress) Map.empty
      else {
        val conformed: Seq[(String, DataFrame)] = spec.compressOrder.flatMap { cName =>
          val compressor = spec.compress(cName)
          val sourceNames = tables.keys.toSeq.sorted
            .filter(t => compressor.include.exists(_.r.findFirstIn(t).isDefined))
          for {
            component <- compressor.componentOrder
            columns = spec.components.getOrElse(component, Nil)
            if columns.nonEmpty
            subst = compressor.components.getOrElse(component, Map.empty)
            t <- sourceNames
          } yield component -> Components.conform(tables(t), columns, subst)
        }
        val order = conformed.map(_._1).distinct
        order.map { component =>
          val merged = Components.merge(conformed.filter(_._1 == component).map(_._2))
          if (persist)
            merged.write.mode(SaveMode.Overwrite).saveAsTable(s"$db.$component")
          component -> merged
        }.toMap
      }

    Result(group, db, tables, components)
  }
}
