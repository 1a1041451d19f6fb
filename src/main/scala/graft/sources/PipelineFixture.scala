package graft.sources

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic end-to-end pipeline fixture: a mini-bucket with two
  * differently-shaped zip sources (the reference's a_vr_snapshot vs
  * a_ncvoter pattern, `bin/cfg.yaml:11-54`), a config spec wiring both
  * compressors onto shared component tables, and the pinned POST-LOAD
  * truth of each source as clean UTF-8 CSVs for DuckDB.
  *
  * This puts the reference's whole raison d'être — Fetch → Sync → Load
  * → Compress (`bin/fetcher.bash:13-24`) — under the hard oracle gate
  * in ONE query: manifest include-filtering (F1-F3), zip streaming
  * decompression (S4), UTF-16/LATIN1 charset decode (S5), quotequote
  * repair (U1/U2), header normalization (U3/U4), quote-blind all-string
  * parse (S6), per-file dispatch (S7), table-name derivation (S8),
  * subst projection (P1-P6), cross-schema conformance (A5), and the
  * unique-index INSERT-OR-IGNORE merge as union-distinct (A2-A4),
  * driven by the O1 pipeline driver off an O2-parsed config.
  *
  * The expected CSVs are hand-pinned constants derived from the
  * reference pipeline's semantics — not computed by the code under
  * test; the oracle replays only the compress stage (conform + UNION
  * distinct, `bin/fetcher.bash:156-160`) over those pinned per-source
  * truths.
  */
object PipelineFixture {

  val dir: String = s"${FixtureDirs.base}/pipeline_bucket"
  private def expectedDir: String = FixtureDirs.base

  /** VR snapshot shape: separate name + phone parts, UTF-16, dirty
    * quotes (U2 case), non-ASCII survivors that only decode correctly
    * under UTF-16. */
  private val vrTsv =
    "Last Name\tMidl Name\tArea Cd\tPhone Num\n" +
      "O\"BRIEN\tA\t919\t5550100\n" +
      "SMITH\tB\t704\t5550199\n" +
      "MÜLLER\tÆ\t336\t5550777\n"

  /** ncvoter shape: pre-joined full phone, LATIN1, clean path. SMITH/B
    * and MÜLLER/Æ duplicate VR rows post-conformance — the merge must
    * drop them. */
  private val ncvTsv =
    "Last Name\tMiddle Name\tFull Phone\n" +
      "SMITH\tB\t7045550199\n" +
      "GARCIA\tC\t3365550142\n" +
      "MÜLLER\tÆ\t3365550777\n"

  /** Pinned post-load truth of each source (all-string, normalized
    * headers, repairs applied). */
  private val vrExpectedCsv =
    "last_name,midl_name,area_cd,phone_num\n" +
      "O'BRIEN,A,919,5550100\n" +
      "SMITH,B,704,5550199\n" +
      "MÜLLER,Æ,336,5550777\n"
  private val ncvExpectedCsv =
    "last_name,middle_name,full_phone\n" +
      "SMITH,B,7045550199\n" +
      "GARCIA,C,3365550142\n" +
      "MÜLLER,Æ,3365550777\n"

  /** The reference cfg.yaml shape: two compressors with per-component
    * subst maps feeding the same component tables. */
  val configYaml: String =
    """fetch:
      |  cycle_t:
      |    bucket1:
      |      include:
      |        - 'VR_Snapshot_.*\.zip$'
      |        - 'ncvoter_Statewide\.zip$'
      |compress:
      |  pack_vr:
      |    include:
      |      - '^vr_snapshot'
      |    components:
      |      c_person:
      |        subst:
      |          middle_name: midl_name
      |      c_contact:
      |        subst:
      |          full_phone: area_cd||phone_num
      |  pack_ncv:
      |    include:
      |      - '^ncvoter_statewide$'
      |    components:
      |      c_person: 1
      |      c_contact: 1
      |components:
      |  c_person:
      |    - last_name
      |    - middle_name
      |  c_contact:
      |    - full_phone
      |""".stripMargin

  private def writeZip(path: String, entryName: String, content: String,
                       charset: java.nio.charset.Charset): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    zos.putNextEntry(new ZipEntry(entryName))
    zos.write(content.getBytes(charset))
    zos.closeEntry(); zos.close()
  }

  /** Write the bucket + expected files (idempotent; tiny). */
  def ensure(): String = {
    Files.createDirectories(Paths.get(dir))
    writeZip(s"$dir/VR_Snapshot_20240601.zip", "VR_Snapshot_20240601.txt",
      vrTsv, StandardCharsets.UTF_16)
    writeZip(s"$dir/ncvoter_Statewide.zip", "ncvoter_Statewide.txt",
      ncvTsv, StandardCharsets.ISO_8859_1)
    // a file the include regexes must exclude (F2)
    Files.write(Paths.get(dir, "layout_notes.txt"),
      "ignore me".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(expectedDir, "vr_pipeline_expected.csv"),
      vrExpectedCsv.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(expectedDir, "ncv_pipeline_expected.csv"),
      ncvExpectedCsv.getBytes(StandardCharsets.UTF_8))
    dir
  }

  def vrExpectedPath: String = s"$expectedDir/vr_pipeline_expected.csv"
  def ncvExpectedPath: String = s"$expectedDir/ncv_pipeline_expected.csv"
}
