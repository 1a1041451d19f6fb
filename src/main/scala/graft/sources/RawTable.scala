package graft.sources

import java.nio.charset.Charset

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import scala.util.matching.Regex

/** Per-file format dispatch + delimited parse & load — the reference's
  * ingest core (reference: `ItemCmds`, `bin/fetcher.bash:90-122`): choose
  * {separator, encoding, decompressor, repair filter, extra columns} by
  * filename pattern, then parse first-row-header delimited text into an
  * all-string table.
  *
  * Ordering constraint (SURVEY.md §7.4): repair must run on decoded
  * lines *before* CSV parsing, so the dirty-source path is
  * bytes → charset decode → lines → repair → `spark.read.csv(Dataset[String])`.
  * Clean sources skip the line detour and use the one-shot
  * `spark.read.csv(path)` so Catalyst keeps pushdown on the scan.
  *
  * All columns load as StringType (`inferSchema=false`) reproducing the
  * reference's all-TEXT semantics; typing happens downstream in
  * component projections.
  */
/** @param quoted whether the parser performs CSV quote processing.
  *   The reference imports tab-separated sources in sqlite `.mode tabs`,
  *   which is QUOTE-BLIND (quotes are ordinary bytes) — only the
  *   `.mode csv` path (Candidate_Listing) interprets quoting. Default
  *   false, mirroring the reference's default tabs mode. */
final case class SourceSpec(
    sep: String = "\t",
    encoding: String = "UTF-8",
    zipped: Boolean = false,
    repair: Boolean = false,
    extraNullColumns: Seq[String] = Nil,
    quoted: Boolean = false)

object RawTable {

  /** The reference's dispatch table (`bin/fetcher.bash:98-118`),
    * expressed as ordered (pattern → spec); first match wins, default is
    * clean UTF-8 TSV. VR snapshots are UTF-16 except 2005-2007 vintages
    * — the reference tests the segment after the LAST underscore
    * (`${base##*_}`, `bin/fetcher.bash:107-110`), so the vintage rule
    * anchors on the final `_`-delimited token (`[^_]*\.zip$` forbids a
    * later underscore), not on the prefix: `VR_Snapshot_NC_20060101.zip`
    * is a 2006 vintage. */
  val referenceDispatch: Seq[(Regex, SourceSpec)] = Seq(
    "^Candidate_Listing_.*\\.csv$".r ->
      SourceSpec(sep = ",", encoding = "ISO-8859-1", repair = true,
        extraNullColumns = Seq("email"), quoted = true),
    "^VR_Snapshot_(.*_)?200[567][^_]*\\.zip$".r ->
      SourceSpec(encoding = "ISO-8859-1", zipped = true, repair = true),
    "^VR_Snapshot_.*\\.zip$".r ->
      SourceSpec(encoding = "UTF-16", zipped = true, repair = true),
    "^ncvoter_Statewide\\.zip$".r ->
      SourceSpec(encoding = "ISO-8859-1", zipped = true),
    "^ncvhis_Statewide\\.zip$".r ->
      SourceSpec(encoding = "ISO-8859-1", zipped = true),
  )

  def dispatch(fileName: String,
               registry: Seq[(Regex, SourceSpec)] = referenceDispatch): SourceSpec =
    registry.collectFirst {
      case (re, spec) if re.findFirstIn(fileName).isDefined => spec
    }.getOrElse(SourceSpec())

  /** Table-name derivation (reference S8, `bin/fetcher.bash:92-94`):
    * basename, strip everything from the first dot, lowercase. */
  def tableName(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    (if (dot >= 0) base.substring(0, dot) else base).toLowerCase
  }

  /** Parse header-first delimited lines into an all-string DataFrame,
    * optionally repairing each line first. Used for the dirty path where
    * parsing can't be a one-shot file scan. */
  def parseLines(spark: SparkSession, lines: Dataset[String],
                 spec: SourceSpec): DataFrame = {
    import org.apache.spark.sql.functions.col
    val repaired: Dataset[String] =
      if (spec.repair) {
        import spark.implicits._
        lines.select(TextRepair.repairLine(col("value")).as("value")).as[String]
      } else lines
    val parsed = spark.read
      .option("header", "true")
      .option("sep", spec.sep)
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      // empty quote char = quote-blind parse (sqlite .mode tabs fidelity)
      .option("quote", if (spec.quoted) "\"" else "")
      .csv(repaired)
    TextRepair.normalizeHeader(parsed)
  }

  /** Clean-path read with explicit malformed-row capture (the O4
    * fail-fast-vs-permissive choice made explicit): rows that fail to
    * parse land whole in `_corrupt_line` instead of being silently
    * nulled or aborting the job — auditable bad-row sink at scale. */
  def readCleanAudited(spark: SparkSession, path: String, spec: SourceSpec,
                       schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", spec.sep)
      .option("encoding", spec.encoding)
      .option("mode", "PERMISSIVE")
      .option("quote", if (spec.quoted) "\"" else "")
      .option("columnNameOfCorruptRecord", "_corrupt_line")
      .schema(schema.add("_corrupt_line", "string"))
      .csv(path)

  /** Clean-path read: one-shot file scan with reader options (keeps the
    * scan a single FileSourceScanExec with pushdown). */
  def readClean(spark: SparkSession, path: String, spec: SourceSpec): DataFrame = {
    val parsed = spark.read
      .option("header", "true")
      .option("sep", spec.sep)
      .option("encoding", spec.encoding)
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      .option("quote", if (spec.quoted) "\"" else "")
      .csv(path)
    TextRepair.normalizeHeader(parsed)
  }

  /** Full per-file load honoring the dispatch spec: zip/charset/repair
    * path for dirty or compressed sources, one-shot scan otherwise, plus
    * load-time extra null columns (reference D1 `ALTER TABLE … ADD
    * COLUMN email`). Returns (tableName, all-string DataFrame). */
  def load(spark: SparkSession, path: String,
           registry: Seq[(Regex, SourceSpec)] = referenceDispatch): (String, DataFrame) = {
    val fileName = path.substring(path.lastIndexOf('/') + 1)
    val spec = dispatch(fileName, registry)
    val base =
      if (spec.zipped) {
        val lines = ZipSource.lines(spark, Seq(path), Charset.forName(spec.encoding))
        parseLines(spark, lines, spec)
      } else if (spec.repair) {
        // NOT spark.read.text: the text source is UTF-8 only (it
        // ignores encoding options), and repair must see decoded lines.
        val lines = ZipSource.textLines(spark, Seq(path),
          Charset.forName(spec.encoding))
        parseLines(spark, lines, spec)
      } else readClean(spark, path, spec)
    val withExtras = spec.extraNullColumns.foldLeft(base) { (df, c) =>
      graft.operators.Components.withNullColumn(df, c)
    }
    tableName(path) -> withExtras
  }
}
