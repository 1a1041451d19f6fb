package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{Listing, RawTable, ZipSource}

class IngestSpec extends SparkSpec {

  private def writeZip(dir: Path, name: String, content: String,
                       charset: Charset): String = {
    val f = dir.resolve(name).toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry(name.stripSuffix(".zip") + ".txt"))
    zos.write(content.getBytes(charset))
    zos.closeEntry(); zos.close()
    f.getAbsolutePath
  }

  test("tableName derivation: basename, first-dot strip, lowercase") {
    assert(RawTable.tableName("/a/b/VR_Snapshot_20240514.zip") == "vr_snapshot_20240514")
    assert(RawTable.tableName("ncvoter_Statewide.zip") == "ncvoter_statewide")
    assert(RawTable.tableName("x/Candidate_Listing_2024.csv") == "candidate_listing_2024")
  }

  test("dispatch picks encoding/sep/repair by filename pattern") {
    assert(RawTable.dispatch("VR_Snapshot_20240514.zip").encoding == "UTF-16")
    // vintage keys off the LAST underscore token (reference ${base##*_})
    assert(RawTable.dispatch("VR_Snapshot_20060101.zip").encoding == "ISO-8859-1")
    assert(RawTable.dispatch("VR_Snapshot_NC_20060101.zip").encoding == "ISO-8859-1")
    assert(RawTable.dispatch("VR_Snapshot_2006_something.zip").encoding == "UTF-16")
    assert(RawTable.dispatch("Candidate_Listing_2024.csv").extraNullColumns == Seq("email"))
    assert(RawTable.dispatch("unknown.tsv") == graft.sources.SourceSpec())
  }

  test("zip lines: UTF-16 TSV round-trips through streaming decode") {
    val dir = Files.createTempDirectory("graft_zip")
    val content = "County ID\tNCID\n1\tAB123\n2\tCD456\n"
    val p = writeZip(dir, "VR_Snapshot_20240514.zip", content, StandardCharsets.UTF_16)
    val lines = ZipSource.lines(spark, Seq(p), StandardCharsets.UTF_16).collect()
    assert(lines.toSeq == Seq("County ID\tNCID", "1\tAB123", "2\tCD456"))
  }

  test("full load: zip + charset + header normalization + all-string schema") {
    val dir = Files.createTempDirectory("graft_load")
    val content = "County ID\tLast Name\n32\tO\"BRIEN\n11\tSMITH\n"
    val p = writeZip(dir, "VR_Snapshot_20240101.zip", content, StandardCharsets.UTF_16)
    val (name, df) = RawTable.load(spark, p)
    assert(name == "vr_snapshot_20240101")
    assert(df.columns.toSeq == Seq("county_id", "last_name"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.orderBy("county_id").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("11", "SMITH"), Seq("32", "O'BRIEN")))
  }

  test("csv load with repair and email column (Candidate_Listing path)") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("Candidate_Listing_2024.csv")
    // JOSÉ in ISO-8859-1: É = 0xC9, invalid as UTF-8 — proves the
    // charset-aware line reader is actually decoding LATIN1.
    Files.write(f, "Name,Office\nO\"HARA,Judge\nJOSÉ,Clerk\n"
      .getBytes(StandardCharsets.ISO_8859_1))
    val (name, df) = RawTable.load(spark, f.toString)
    assert(name == "candidate_listing_2024")
    assert(df.columns.toSeq == Seq("name", "office", "email"))
    val rows = df.orderBy("office").collect()
    assert(rows(1).getString(0) == "O'HARA" && rows(1).isNullAt(2))
    assert(rows(0).getString(0) == "JOSÉ")
  }

  test("audited read captures malformed rows instead of dropping them") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_audit")
    val f = dir.resolve("data.csv")
    Files.write(f, "a,b\n1,2\nnot_an_int,5\n3,4\n".getBytes(StandardCharsets.UTF_8))
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", IntegerType)))
    // Spark disallows querying only the corrupt column off the raw
    // file — materialize first (cache), as its own error message advises.
    val df = RawTable.readCleanAudited(spark, f.toString,
      graft.sources.SourceSpec(sep = ","), schema).cache()
    val bad = df.filter(org.apache.spark.sql.functions.col("_corrupt_line").isNotNull)
      .collect()
    assert(bad.length == 1 && bad.head.getString(2).startsWith("not_an_int"))
    assert(df.filter(org.apache.spark.sql.functions.col("_corrupt_line").isNull).count() == 2)
  }

  test("hash sampling: deterministic, disjoint train/test split") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = (1L to 1000L).toDF("k")
    val s1 = graft.operators.Sampling.hashSample(df, col("k"), 0.2).collect().map(_.getLong(0)).toSet
    val s2 = graft.operators.Sampling.hashSample(df, col("k"), 0.2).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(s1.size > 100 && s1.size < 300) // ~20%
    val (train, test) = graft.operators.Sampling.trainTestSplit(df, col("k"), 0.25)
    val (tr, te) = (train.collect().map(_.getLong(0)).toSet, test.collect().map(_.getLong(0)).toSet)
    assert(tr.intersect(te).isEmpty)
    assert(tr.size + te.size == 1000)
  }

  test("manifest keys + include filter: regex OR, dir exclusion, dedup") {
    val dir = Files.createTempDirectory("graft_manifest")
    val manifest =
      """{"Versions": [
        |  {"Key": "data/ncvoter_Statewide.zip", "VersionId": "1"},
        |  {"Key": "data/ncvoter_Statewide.zip", "VersionId": "2"},
        |  {"Key": "data/", "VersionId": "3"},
        |  {"Key": "other/readme.md", "VersionId": "4"},
        |  {"Key": "Snapshots/VR_Snapshot_20240514.zip", "VersionId": "5"}
        |]}""".stripMargin
    val f = dir.resolve("versions.json")
    Files.write(f, manifest.getBytes(StandardCharsets.UTF_8))
    val keys = Listing.keys(spark, f.toString)
    val out = Listing.includeFilter(keys,
      Seq("_Statewide\\.zip$", "Snapshots/VR_Snapshot_"))
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("Snapshots/VR_Snapshot_20240514.zip", "data/ncvoter_Statewide.zip"))
  }

  test("planFiles prunes by pattern before any scan") {
    val dir = Files.createTempDirectory("graft_plan")
    Files.write(dir.resolve("keep_Statewide.zip"), Array[Byte](1))
    Files.write(dir.resolve("skip.txt"), Array[Byte](1))
    val planned = Listing.planFiles(spark, dir.toString, Seq("_Statewide\\.zip$".r))
    assert(planned.size == 1 && planned.head.endsWith("keep_Statewide.zip"))
  }

  test("temporalPatterns: statewide + 2 snapshot years + 9 election years") {
    val p = Listing.temporalPatterns(2024)
    assert(p.contains("Snapshots/VR_Snapshot_2023"))
    assert(p.contains("Snapshots/VR_Snapshot_2024"))
    assert(p.count(_.startsWith("Elections/")) == 9)
    assert(p.contains("Elections/2016") && !p.contains("Elections/2015"))
  }

  test("TarSource: two-member gzip'd ustar concatenates across member " +
      "boundaries with per-member BOMs; non-regular members skip") {
    graft.sources.TarFixture.ensure()
    val lines = graft.sources.TarSource.lines(spark,
        Seq(graft.sources.TarFixture.tarGzPath),
        Charset.forName("UTF-16"))
      .collect()
    assert(lines.length == 5, lines.mkString("|"))
    assert(lines.head.startsWith("County ID"))
    assert(lines(3).contains("MÜLLER") && lines(4).contains("JONES"))
    // a directory member between two files is skipped whole
    val out = new ByteArrayOutputStream()
    out.write(graft.sources.TarFixture.member("a.txt",
      "h1\tv\nr1\tx\n".getBytes(StandardCharsets.UTF_8)))
    val dirHeader = graft.sources.TarFixture.member("d/", Array.emptyByteArray)
      .clone()
    dirHeader(156) = '5' // typeflag: directory — checksum now stale, so
    // rebuild it the way the writer does
    java.util.Arrays.fill(dirHeader, 148, 156, ' '.toByte)
    val sum = dirHeader.take(512).map(_ & 0xFF).sum
    System.arraycopy(f"$sum%06o  ".getBytes(StandardCharsets.US_ASCII), 0,
      dirHeader, 148, 8)
    out.write(dirHeader)
    out.write(graft.sources.TarFixture.member("b.txt",
      "r2\ty\n".getBytes(StandardCharsets.UTF_8)))
    out.write(new Array[Byte](1024))
    val p = Files.createTempFile("graft_tar_spec", ".tar")
    Files.write(p, out.toByteArray)
    val got = graft.sources.TarSource.lines(spark, Seq(p.toString),
      StandardCharsets.UTF_8).collect().toSeq
    assert(got == Seq("h1\tv", "r1\tx", "r2\ty"), got.mkString("|"))
  }

  test("TarSource.members: binary round-trip through a shard; an " +
      "oversized member fails loudly") {
    val payload = Array.tabulate[Byte](700)(i => (i % 251).toByte)
    val out = new ByteArrayOutputStream()
    out.write(graft.sources.TarFixture.member("bin.dat", payload))
    out.write(new Array[Byte](1024))
    val p = Files.createTempFile("graft_tar_bin", ".tar")
    Files.write(p, out.toByteArray)
    val got = graft.sources.TarSource.members(spark, Seq(p.toString))
      .collect()
    assert(got.length == 1 && got.head.getString(1) == "bin.dat")
    assert(got.head.getAs[Array[Byte]](2).toSeq == payload.toSeq)
    // a member past maxMemberBytes is a loud refusal, not a quiet OOM
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.TarSource.members(spark, Seq(p.toString),
        maxMemberBytes = 100L).collect()
    }
    assert(e.getMessage.contains("maxMemberBytes") ||
      Option(e.getCause).exists(_.getMessage.contains("maxMemberBytes")))
  }

  test("TarSource: a corrupted header checksum fails loudly, never " +
      "guesses at framing") {
    val bytes = graft.sources.TarFixture.archiveBytes.clone()
    bytes(148) = '7' // stomp the checksum field
    val p = Files.createTempFile("graft_tar_bad", ".tar")
    Files.write(p, bytes)
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.TarSource.lines(spark, Seq(p.toString),
        StandardCharsets.UTF_16).collect()
    }
    assert(e.getMessage.contains("checksum") ||
      Option(e.getCause).exists(_.getMessage.contains("checksum")),
      s"got: ${e.getMessage}")
  }

  /** Clone a fixture header block, mutate it, rebuild the checksum the
    * way the writer does — the dirHeader precedent above. */
  private def remint(block: Array[Byte])(mutate: Array[Byte] => Unit): Array[Byte] = {
    val h = block.clone()
    mutate(h)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.take(512).map(_ & 0xFF).sum
    System.arraycopy(f"$sum%06o  ".getBytes(StandardCharsets.US_ASCII), 0,
      h, 148, 8)
    h
  }

  test("TarSource.members: ustar prefix field joins into the member " +
      "name; a GNU 'L' long-name extension fails loudly") {
    val data = "x".getBytes(StandardCharsets.UTF_8)
    val withPrefix = remint(graft.sources.TarFixture.member("leaf.png", data)) { h =>
      val p = "shard0001/images".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(p, 0, h, 345, p.length)
    }
    val out = new ByteArrayOutputStream()
    out.write(withPrefix)
    out.write(new Array[Byte](1024))
    val p = Files.createTempFile("graft_tar_prefix", ".tar")
    Files.write(p, out.toByteArray)
    val got = graft.sources.TarSource.members(spark, Seq(p.toString)).collect()
    assert(got.length == 1 &&
      got.head.getString(1) == "shard0001/images/leaf.png", got.mkString("|"))
    // GNU 'L': skipping it would mis-key the NEXT member silently —
    // the walk must refuse instead
    val gnuL = remint(graft.sources.TarFixture.member(
      "././@LongLink", "a/very/long/path ".getBytes)) { h => h(156) = 'L' }
    val out2 = new ByteArrayOutputStream()
    out2.write(gnuL)
    out2.write(graft.sources.TarFixture.member("truncated.name", data))
    out2.write(new Array[Byte](1024))
    val p2 = Files.createTempFile("graft_tar_gnul", ".tar")
    Files.write(p2, out2.toByteArray)
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.TarSource.members(spark, Seq(p2.toString)).collect()
    }
    assert(e.getMessage.contains("long-name") ||
      Option(e.getCause).exists(_.getMessage.contains("long-name")),
      s"got: ${e.getMessage}")
  }

  test("TarSource.members: old-GNU magic ('ustar  \\0') does NOT enable " +
      "the prefix field — offset 345 holds atime there, and honoring it " +
      "would prepend garbage to the member name") {
    val data = "y".getBytes(StandardCharsets.UTF_8)
    val oldGnu = remint(graft.sources.TarFixture.member("plain.txt", data)) { h =>
      // old-GNU magic: "ustar  \0" spans 257..264 (no separate version)
      val m = Array[Byte]('u', 's', 't', 'a', 'r', ' ', ' ', 0)
      System.arraycopy(m, 0, h, 257, m.length)
      // --incremental archives put octal atime at 345: non-NUL bytes
      // that a loose 'ustar' check would read as a path prefix
      val atime = "12345670123 ".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(atime, 0, h, 345, atime.length)
    }
    val out = new ByteArrayOutputStream()
    out.write(oldGnu)
    out.write(new Array[Byte](1024))
    val p = Files.createTempFile("graft_tar_oldgnu", ".tar")
    Files.write(p, out.toByteArray)
    val got = graft.sources.TarSource.members(spark, Seq(p.toString)).collect()
    assert(got.length == 1 && got.head.getString(1) == "plain.txt",
      got.mkString("|"))
  }

  test("TarSource.members: a cap above Int.MaxValue is refused up " +
      "front (size.toInt would wrap, mis-framing a >2GiB member)") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.TarSource.members(spark, Seq("/nonexistent.tar"),
        maxMemberBytes = Int.MaxValue.toLong + 1)
    }
    assert(e.getMessage.contains("Int.MaxValue"))
  }

  test("archive streams close at task end, not stream EOF: limit(1) " +
      "abandons the member iterator mid-archive without leaking") {
    graft.sources.TarFixture.ensure()
    val o0 = graft.sources.ArchiveStreamAudit.opened.get()
    val c0 = graft.sources.ArchiveStreamAudit.closed.get()
    // tar path: 5 data lines across two members; take 1 and abandon
    val one = graft.sources.TarSource.lines(spark,
      Seq(graft.sources.TarFixture.tarGzPath), Charset.forName("UTF-16"))
      .limit(1).collect()
    assert(one.length == 1)
    // zip path: same short-circuit through ZipSource.lines
    val dir = Files.createTempDirectory("graft_zip_leak")
    val zp = writeZip(dir, "leak_check.zip", "h\n" + ("r\n" * 5000),
      StandardCharsets.UTF_8)
    val zOne = ZipSource.lines(spark, Seq(zp), StandardCharsets.UTF_8)
      .limit(1).collect()
    assert(zOne.length == 1)
    // task-completion listeners run on the task thread before the job
    // returns, so by now every opened archive stream must be closed
    val dOpen = graft.sources.ArchiveStreamAudit.opened.get() - o0
    val dClose = graft.sources.ArchiveStreamAudit.closed.get() - c0
    assert(dOpen >= 2 && dClose == dOpen, s"opened $dOpen closed $dClose")
  }
}
