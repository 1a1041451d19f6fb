package graft.sources.v2

import java.io.InputStream
import java.util
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for WARC web-archive files (ISO 28500 — the format
  * web crawls ship in): `spark.read.format("warc").load(pathOrGlob)`
  * yields one row per WARC record with the header fields that matter
  * for curation (`warc_type`, `target_uri`, `warc_date`, `record_id`,
  * `content_type`, `content_length`), the raw `payload` bytes, and
  * provenance (`path`, `record_offset`).
  *
  * Scale design — the part that matters at 100 TB of crawl data:
  *
  *  - **Plain `.warc` files split by byte range** (`splitSize` option,
  *    default 128 MiB), like Hadoop text splits: a reader whose range
  *    starts mid-file aligns forward to the `\r\n\r\nWARC/` record
  *    boundary and owns every record whose FIRST byte falls inside its
  *    range (reading past the range end to finish a straddling record).
  *    A candidate boundary is only accepted after its header block
  *    actually parses (terminated header set with a valid
  *    Content-Length); rejected bytes are pushed back and re-scanned,
  *    so a payload that embeds the magic bytes cannot make the reader
  *    lose or duplicate a record. One 10 GB warc scans on 80 cores.
  *  - **`.warc.gz` files read whole** (gzip is not seekable without an
  *    external index; Common-Crawl-style member-per-record gz streams
  *    decode as one concatenated stream). File-level parallelism only —
  *    which is what every production crawl reader does without a
  *    `.cdx` index.
  *  - **Payload pruning**: when the projection does not include
  *    `payload`, bodies are SKIPPED, not read — a metadata-only query
  *    (`count by content_type`) streams headers at I/O speed.
  *  - After alignment, parsing is STRICT by default: a malformed
  *    record mid-file raises with the file and byte offset rather than
  *    silently resyncing past corrupt data. `option("mode",
  *    "permissive")` instead resyncs to the next VALIDATED record
  *    boundary and keeps going — real crawl archives do contain
  *    truncated records — with the damage surfaced, not swallowed:
  *    skipped-record and skipped-byte counts are reported as DSv2
  *    custom metrics (visible per-stage in the Spark UI), mirroring
  *    the reference's fail-fast vs permissive ingest split (O4,
  *    `bin/fetcher.bash`).
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Warc.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object Warc {
  val fullSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("path", StringType, nullable = false),
    StructField("record_offset", LongType, nullable = false)))

  /** Globs expand, directories list their .warc/.warc.gz members,
    * literal files pass through. */
  private[v2] def resolve(paths: Seq[String], conf: Configuration): Seq[String] =
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
            .map(_.getPath.toString)
            .filter(n => n.toLowerCase.endsWith(".warc") ||
              n.toLowerCase.endsWith(".warc.gz"))
        else Seq(st.getPath.toString)
      }
    }.distinct.sorted
}

class WarcTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"warc(${ZipLines.requestedPaths(props).mkString(",")})"
  override def schema(): StructType = Warc.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(props ++ options.asScala)
}

class WarcScanBuilder(props: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Warc.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val spark = SparkSession.active
    val hadoopConf = spark.sessionState.newHadoopConf()
    val confMap = hadoopConf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val files = Warc.resolve(ZipLines.requestedPaths(props), hadoopConf)
    val splitSize = props.get("splitsize").map(_.toLong).getOrElse(128L << 20)
    val maxPayload = props.get("maxpayloadbytes").map(_.toLong).getOrElse(256L << 20)
    require(splitSize > 0 && maxPayload > 0, "splitSize/maxPayloadBytes must be > 0")
    val mode = props.getOrElse("mode", "strict").toLowerCase
    require(mode == "strict" || mode == "permissive",
      s"warc mode must be strict or permissive, got $mode")
    WarcScan(files, ZipLines.requestedPaths(props), splitSize, maxPayload,
      mode == "permissive", required, confMap)
  }
}

/** Corrupt-record accounting for permissive mode, surfaced per stage in
  * the Spark UI — skipped damage must be visible, never silent. */
final class WarcSkippedRecords extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "warcSkippedRecords"
  override def description(): String = "skipped corrupt WARC records"
}
final class WarcSkippedBytes extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "warcSkippedBytes"
  override def description(): String = "bytes skipped resyncing past corrupt WARC data"
}

/** Byte range [start, end) of a plain .warc file. */
final case class WarcSplitPartition(path: String, start: Long, end: Long)
    extends InputPartition

/** A whole .warc.gz file (not seekable). */
final case class WarcGzPartition(path: String) extends InputPartition

final case class WarcScan(files: Seq[String], sourcePaths: Seq[String],
                          splitSize: Long, maxPayload: Long,
                          permissive: Boolean,
                          required: StructType, confMap: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new WarcSkippedRecords, new WarcSkippedBytes)
  override def description(): String =
    s"warc ${files.size} files, splitSize=$splitSize, mode=${if (permissive) "permissive" else "strict"}"
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    files.flatMap { f =>
      if (f.toLowerCase.endsWith(".gz")) Seq(WarcGzPartition(f): InputPartition)
      else {
        val hp = new Path(f)
        val len = hp.getFileSystem(conf).getFileStatus(hp).getLen
        (0L until len by splitSize).map { s =>
          WarcSplitPartition(f, s, math.min(s + splitSize, len)): InputPartition
        }
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames, maxPayload, permissive, confMap)

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new WarcMicroBatchStream(this)
}

/** Streaming ingestion of a crawl landing directory:
  * `spark.readStream.format("warc").load(dir)` emits each newly landed
  * archive's records exactly once. The offset is a lexicographic
  * FILE-NAME WATERMARK — O(1) state regardless of history, no
  * ever-growing processed-file log — which rests on the two contracts
  * every crawl landing zone already meets: archives are named
  * monotonically (timestamped, `crawl_YYYYMMDD….warc`) and land
  * atomically (write-temp-then-rename). A file landing with a name at
  * or below the watermark is IGNORED by construction; that is the
  * documented trade for bounded offset state (the reference's
  * cycle-vintage sync rule makes the same bet). Re-listing at plan
  * time is safe for the same reason: the (start, end] name interval
  * pins an immutable file set. */
final class WarcMicroBatchStream(scan: WarcScan)
    extends streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def conf = {
    val c = new Configuration(false)
    scan.confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  // scan.files was resolved once at build time; a stream must re-list
  private def listed: Seq[String] = Warc.resolve(scan.sourcePaths, conf)

  override def initialOffset(): Offset = WarcNameOffset("")
  override def latestOffset(): Offset = {
    val fs = listed
    WarcNameOffset(if (fs.isEmpty) "" else fs.max)
  }
  override def deserializeOffset(json: String): Offset =
    WarcNameOffset(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("watermark").asText())
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WarcNameOffset].watermark
    val hi = end.asInstanceOf[WarcNameOffset].watermark
    val batch = listed.filter(f => f > lo && f <= hi)
    scan.copy(files = batch).planInputPartitions()
  }
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(scan.required.fieldNames, scan.maxPayload,
      scan.permissive, scan.confMap)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class WarcNameOffset(watermark: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .createObjectNode().put("watermark", watermark).toString
}

final case class WarcReaderFactory(fields: Array[String], maxPayload: Long,
                                   permissive: Boolean,
                                   confMap: Map[String, String])
    extends PartitionReaderFactory {
  private def conf = {
    val c = new Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case WarcSplitPartition(path, start, end) =>
        val hp = new Path(path)
        val fsIn = hp.getFileSystem(conf).open(hp)
        // read 4 bytes before the range so a record starting EXACTLY at
        // `start` still shows its \r\n\r\n magic prefix to the aligner
        val seekTo = math.max(0L, start - 4)
        fsIn.seek(seekTo)
        new WarcPartitionReader(
          new PushbackCounting(fsIn, seekTo), path, start, end,
          alignFirst = start > 0, fields, maxPayload, permissive,
          () => fsIn.close())
      case WarcGzPartition(path) =>
        val hp = new Path(path)
        val fsIn = hp.getFileSystem(conf).open(hp)
        val gz = new GZIPInputStream(fsIn, 1 << 16)
        new WarcPartitionReader(
          new PushbackCounting(gz, 0L), path, 0L, Long.MaxValue,
          alignFirst = false, fields, maxPayload, permissive,
          () => { gz.close(); fsIn.close() })
    }
}

/** Counting byte stream with arbitrary-length pushback — the aligner
  * returns rejected boundary candidates through [[unread]] so no byte
  * is ever lost to a failed validation. `pos` is the absolute offset of
  * the next byte to be read. */
final class PushbackCounting(in: InputStream, startPos: Long) {
  private var back: List[Array[Byte]] = Nil
  private var backOff = 0
  var pos: Long = startPos

  def read(): Int = back match {
    case h :: t =>
      val b = h(backOff) & 0xFF
      backOff += 1
      if (backOff == h.length) { back = t; backOff = 0 }
      pos += 1; b
    case Nil =>
      val b = in.read()
      if (b >= 0) pos += 1
      b
  }

  /** Read exactly n bytes into a fresh array; false on premature EOF. */
  def readFully(dst: Array[Byte], off: Int, n: Int): Boolean = {
    var got = 0
    while (got < n) {
      back match {
        case h :: t =>
          val take = math.min(n - got, h.length - backOff)
          System.arraycopy(h, backOff, dst, off + got, take)
          backOff += take; got += take; pos += take
          if (backOff == h.length) { back = t; backOff = 0 }
        case Nil =>
          val r = in.read(dst, off + got, n - got)
          if (r < 0) return false
          got += r; pos += r
      }
    }
    true
  }

  /** Skip exactly n bytes; false on premature EOF. */
  def skipFully(n: Long): Boolean = {
    var left = n
    val tmp = new Array[Byte](math.min(left, 1L << 16).toInt)
    while (left > 0) {
      val want = math.min(left, tmp.length.toLong).toInt
      if (!readFully(tmp, 0, want)) return false
      left -= want
    }
    true
  }

  /** Push bytes back; they are re-read before the stream, and `pos`
    * rewinds accordingly. */
  def unread(bytes: Array[Byte]): Unit = if (bytes.nonEmpty) {
    back = if (backOff == 0) bytes :: back
    else bytes :: back.head.drop(backOff) :: back.tail
    backOff = 0
    pos -= bytes.length
  }
}

private object WarcParse {
  val Magic: Array[Byte] = "\r\n\r\nWARC/".getBytes("US-ASCII")
  val MaxHeaderBytes = 1 << 16

  /** Parse a CRLF-terminated header block (starting AFTER "WARC/") out
    * of `buf(0 until len)`. Returns (headers lowercased, version rest,
    * bytes consumed incl. the blank line) or None if the block is
    * malformed / lacks Content-Length / is not terminated within len. */
  def parseHeader(buf: Array[Byte], len: Int): Option[(Map[String, String], Int)] = {
    // find \r\n\r\n terminator
    var i = 0
    var hEnd = -1
    while (hEnd < 0 && i + 3 < len) {
      if (buf(i) == '\r' && buf(i + 1) == '\n' && buf(i + 2) == '\r' && buf(i + 3) == '\n')
        hEnd = i
      i += 1
    }
    if (hEnd < 0) return None
    val text = new String(buf, 0, hEnd, "UTF-8")
    val lines = text.split("\r\n", -1)
    // lines(0) is the version remainder ("1.0", "1.1", ...)
    if (lines.isEmpty || !lines(0).matches("[0-9]+\\.[0-9]+")) return None
    val hs = Map.newBuilder[String, String]
    var k = 1
    while (k < lines.length) {
      val line = lines(k)
      val c = line.indexOf(':')
      if (c <= 0) return None
      hs += (line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
      k += 1
    }
    val m = hs.result()
    if (!m.get("content-length").exists(_.matches("[0-9]+"))) return None
    Some((m, hEnd + 4))
  }
}

/** Reads every WARC record whose first byte lies in [rangeStart,
  * rangeEnd) of one file (or the whole stream for gz). */
final class WarcPartitionReader(in: PushbackCounting, path: String,
                                rangeStart: Long, rangeEnd: Long,
                                alignFirst: Boolean, fields: Array[String],
                                maxPayload: Long, permissive: Boolean,
                                closer: () => Unit)
    extends PartitionReader[InternalRow] {
  import WarcParse._

  private val pathUtf8 = UTF8String.fromString(path)
  private val needPayload = fields.contains("payload")
  private var aligned = !alignFirst
  private var row: InternalRow = _
  private var skippedRecords = 0L
  private var skippedBytes = 0L

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      new org.apache.spark.sql.connector.metric.CustomTaskMetric {
        override def name(): String = "warcSkippedRecords"
        override def value(): Long = skippedRecords
      },
      new org.apache.spark.sql.connector.metric.CustomTaskMetric {
        override def name(): String = "warcSkippedBytes"
        override def value(): Long = skippedBytes
      })

  /** Scan forward for a VALIDATED record boundary whose "WARC/" starts
    * in [rangeStart, rangeEnd); leaves the stream positioned AT the
    * record start. False when no such record exists. A ring buffer of
    * the last `Magic.length` bytes is compared in full after every
    * byte — unlike a hand-rolled prefix matcher this cannot miss
    * overlapping near-matches (`\r\n\r\n\r\nWARC/` must still hit). */
  private def align(): Boolean = {
    val L = Magic.length
    val ring = new Array[Byte](L)
    var seen = 0L
    while (true) {
      val b = in.read()
      if (b < 0) return false
      ring((seen % L).toInt) = b.toByte
      seen += 1
      var isMatch = seen >= L
      var i = 0
      while (isMatch && i < L) {
        if (ring(((seen + i) % L).toInt) != Magic(i)) isMatch = false
        i += 1
      }
      if (isMatch) {
        val candStart = in.pos - 5 // first byte of "WARC/"
        if (candStart >= rangeStart && candStart < rangeEnd) {
          // validate: buffer ahead and try to parse the header block
          val buf = new Array[Byte](MaxHeaderBytes)
          var n = 0
          var eof = false
          while (n < buf.length && !eof) {
            val r = in.read()
            if (r < 0) eof = true else { buf(n) = r.toByte; n += 1 }
          }
          in.unread(java.util.Arrays.copyOf(buf, n))
          if (parseHeader(buf, n).isDefined) {
            in.unread("WARC/".getBytes("US-ASCII"))
            return true
          }
          // rejected candidate: header bytes were pushed back, nothing
          // lost; keep scanning (the ring still holds the rejected
          // magic so an overlapping true boundary is still found)
        }
      }
      // the earliest future candidate would start at in.pos - 4; once
      // that is past the range there is nothing left to own
      if (in.pos - 4 >= rangeEnd) return false
    }
    false
  }

  private def fail(msg: String): Nothing =
    throw new java.io.IOException(
      s"warc: $msg at $path:${in.pos} (range $rangeStart-$rangeEnd)")

  /** Parse the record that starts at the current position. Returns
    * false at clean EOF / range end. */
  private def readRecord(): Boolean = {
    val recordStart = in.pos
    if (recordStart >= rangeEnd) return false
    // version line prefix
    val first = in.read()
    if (first < 0) return false
    val sig = new Array[Byte](5)
    sig(0) = first.toByte
    if (!in.readFully(sig, 1, 4) || new String(sig, "US-ASCII") != "WARC/")
      fail("expected WARC/ record signature")
    val buf = new Array[Byte](MaxHeaderBytes)
    var n = 0
    var eof = false
    while (n < buf.length && !eof) {
      val r = in.read()
      if (r < 0) eof = true else { buf(n) = r.toByte; n += 1 }
    }
    in.unread(java.util.Arrays.copyOf(buf, n))
    val (headers, consumed) = parseHeader(buf, n)
      .getOrElse(fail("malformed record header"))
    if (!in.skipFully(consumed)) fail("truncated header")
    val cl = headers("content-length").toLong
    if (cl > maxPayload)
      fail(s"payload of $cl bytes exceeds maxPayloadBytes=$maxPayload")
    val payload: Array[Byte] =
      if (needPayload) {
        if (cl > Int.MaxValue - 8)
          fail(s"payload of $cl bytes cannot materialize as one array")
        val p = new Array[Byte](cl.toInt)
        if (!in.readFully(p, 0, cl.toInt)) fail("truncated payload")
        p
      } else {
        if (!in.skipFully(cl)) fail("truncated payload")
        null
      }
    // trailing \r\n\r\n (tolerate EOF directly after the final payload)
    val trail = new Array[Byte](4)
    if (in.readFully(trail, 0, 4) &&
      !(trail(0) == '\r' && trail(1) == '\n' && trail(2) == '\r' && trail(3) == '\n'))
      fail("missing record trailer")
    def s(k: String): UTF8String =
      headers.get(k).map(UTF8String.fromString).orNull
    val values: Array[Any] = fields.map {
      case "warc_type"      => s("warc-type")
      case "target_uri"     => s("warc-target-uri")
      case "warc_date"      => s("warc-date")
      case "record_id"      => s("warc-record-id")
      case "content_type"   => s("content-type")
      case "content_length" => cl
      case "payload"        => payload
      case "path"           => pathUtf8
      case "record_offset"  => recordStart
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    row = new GenericInternalRow(values)
    true
  }

  override def next(): Boolean = {
    if (!aligned) { aligned = true; if (!align()) return false }
    if (!permissive) readRecord()
    else {
      // permissive: a record that fails to parse is skipped by
      // resyncing to the next VALIDATED boundary still inside the
      // range; the damage is counted, never silent
      while (true) {
        val failStart = in.pos
        try return readRecord()
        catch {
          case e: java.io.IOException =>
            skippedRecords += 1
            if (!align()) { skippedBytes += in.pos - failStart; return false }
            skippedBytes += in.pos - failStart
        }
      }
      false
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = closer()
}
