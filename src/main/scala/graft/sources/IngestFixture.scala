package graft.sources

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic ingest-path fixture for the oracle suite: a zip'd
  * UTF-16 TSV with the reference's dirty-data pathologies (stray inch
  * -mark quotes for U1, quote-between-capitals for U2, spaced/cased
  * headers for U3/U4, non-ASCII text that only survives a correct
  * charset decode) plus the pinned post-load truth as a clean UTF-8
  * CSV for DuckDB to read back.
  *
  * This drives the reference's actual day job (zip → iconv → quotequote
  * → import, `bin/fetcher.bash:90-122`) through the hard correctness
  * gate instead of unit tests only. The expected rows are hand-pinned
  * CONSTANTS derived from the reference pipeline's semantics (the U1
  * double-opening-quote behavior is verified against `bin/quotequote`
  * output in TextRepairSpec), not computed by the code under test.
  *
  * Unquoted-field discipline: the reference imports VR snapshots in
  * sqlite `.mode tabs`, which performs NO quote processing — a repaired
  * field like `he is ""5' 10"" tall` stays byte-literal. Spark's CSV
  * reader matches that for fields not STARTING with a quote, so the
  * fixture (like the real data, where quotes appear mid-field) avoids
  * quote-initial fields; that corner is documented as out of scope.
  */
/** One per-process temp root for all oracle fixtures. Fixed /tmp paths
  * race across concurrent JVMs (sbt test vs Verify vs Bench): a stale or
  * foreign file would silently become the oracle input. Queries embed
  * these paths into oracle SQL in the same process that writes the
  * files, so query and oracle always agree. */
object FixtureDirs {
  lazy val base: String =
    Files.createTempDirectory("graft_fixtures_").toString
}

object IngestFixture {

  val dir: String = FixtureDirs.base
  val zipName = "VR_Snapshot_20240601.zip"
  val expectedCsvName = "vr_snapshot_expected.csv"

  /** Dirty source, exactly as the reference would download it. */
  private val dirtyTsv =
    "County ID\tLast Name\tNote\n" +
      "1\tO\"BRIEN\tnormal\n" +                      // U2: O"BRIEN -> O'BRIEN
      "2\tSMITH\the is \"5' 10\" tall\n" +           // U1: both quotes doubled
      "3\tMÜLLER\tcafé row\n"              // UTF-16-only survivors

  /** Pinned post-load truth (UTF-8 CSV, RFC-quoted for DuckDB). The
    * loaded `note` value is the byte-literal repaired text
    * `he is ""5' 10"" tall` (quote-blind tabs parse keeps the doubled
    * quotes), so RFC encoding doubles each of those quotes again. */
  private val expectedCsv =
    "county_id,last_name,note\n" +
      "1,O'BRIEN,normal\n" +
      "2,SMITH,\"he is \"\"\"\"5' 10\"\"\"\" tall\"\n" +
      "3,MÜLLER,café row\n"

  /** Write both fixture files (idempotent; tiny) and return the dir. */
  def ensure(): String = {
    Files.createDirectories(Paths.get(dir))
    val zipPath = Paths.get(dir, zipName)
    val zos = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    zos.putNextEntry(new ZipEntry(zipName.stripSuffix(".zip") + ".txt"))
    zos.write(dirtyTsv.getBytes(StandardCharsets.UTF_16))
    zos.closeEntry(); zos.close()
    Files.write(Paths.get(dir, expectedCsvName),
      expectedCsv.getBytes(StandardCharsets.UTF_8))
    dir
  }

  def zipPath: String = s"$dir/$zipName"
  def expectedCsvPath: String = s"$dir/$expectedCsvName"
}
