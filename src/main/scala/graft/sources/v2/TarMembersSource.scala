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
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for tar member rows — `spark.read.format("tar")
  * .load(pathOrGlob)` and, the point of the class,
  * `spark.readStream.format("tar").load(landingDir)`: WebDataset-style
  * shard archives land continuously in a crawl→shard→train pipeline,
  * and this is the live half of the batch
  * [[graft.sources.TarSource.members]] path (same verified ustar walk,
  * same (archive, name, content) row shape, byte-identical members).
  *
  * Batch: tar is not splittable, so one input partition owns one
  * archive and streams header-walk → member bytes at the archive's
  * native order; callers repartition after decode (the
  * [[graft.sources.ZipSource]] design note). Gzip shards
  * (.tar.gz/.tgz) decode through the JDK inflater.
  *
  * Streaming: the offset is the lexicographic FILE-NAME WATERMARK of
  * [[WarcMicroBatchStream]] — O(1) state regardless of history,
  * resting on the same two landing-zone contracts (monotonic shard
  * names, atomic write-then-rename landings). A shard landing at or
  * below the watermark is ignored by construction; that is the
  * documented trade for bounded offset state.
  *
  * `option("maxMemberBytes", n)`: per-member materialization bound
  * (default 64 MiB), enforced loudly by the member walk — a multi-GB
  * member is an upstream sharding bug, never something to buffer
  * quietly. */
class TarMembersSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tar"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarMembers.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TarMembersTable(properties.asScala.toMap)
}

object TarMembers {
  val schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Globs expand, directories list their tar members, literal files
    * pass through — the [[Warc.resolve]] convention. */
  private[v2] def resolve(paths: Seq[String], conf: Configuration): Seq[String] =
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
            .map(_.getPath.toString)
            .filter { n =>
              val l = n.toLowerCase
              l.endsWith(".tar") || l.endsWith(".tar.gz") || l.endsWith(".tgz")
            }
        else Seq(st.getPath.toString)
      }
    }.distinct.sorted
}

class TarMembersTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"tar(${ZipLines.requestedPaths(props).mkString(",")})"
  override def schema(): StructType = TarMembers.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarMembersScanBuilder(props ++ options.asScala)
}

class TarMembersScanBuilder(props: Map[String, String]) extends ScanBuilder {
  override def build(): Scan = {
    val spark = SparkSession.active
    val hadoopConf = spark.sessionState.newHadoopConf()
    val confMap = hadoopConf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val maxMember = props.get("maxmemberbytes").map(_.toLong).getOrElse(64L << 20)
    require(maxMember > 0 && maxMember <= Int.MaxValue,
      s"maxMemberBytes must be in (0, Int.MaxValue], got $maxMember")
    TarMembersScan(
      TarMembers.resolve(ZipLines.requestedPaths(props), hadoopConf),
      ZipLines.requestedPaths(props), maxMember, confMap)
  }
}

final case class TarArchivePartition(path: String) extends InputPartition

final case class TarMembersScan(files: Seq[String], sourcePaths: Seq[String],
                                maxMemberBytes: Long,
                                confMap: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = TarMembers.schema
  override def toBatch: Batch = this
  override def description(): String = s"tar ${files.size} archives"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(TarArchivePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    TarMembersReaderFactory(maxMemberBytes, confMap)
  override def toMicroBatchStream(checkpointLocation: String)
      : streaming.MicroBatchStream =
    new TarMicroBatchStream(this)
}

/** Lexicographic landing-directory tail — [[WarcMicroBatchStream]]'s
  * name-watermark offset applied to tar shards (see that class for the
  * contract reasoning; the (start, end] name interval pins an
  * immutable file set, so re-listing at plan time is safe). */
final class TarMicroBatchStream(scan: TarMembersScan)
    extends streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def conf = {
    val c = new Configuration(false)
    scan.confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private def listed: Seq[String] = TarMembers.resolve(scan.sourcePaths, conf)

  override def initialOffset(): Offset = TarNameOffset("")
  override def latestOffset(): Offset = {
    val fs = listed
    TarNameOffset(if (fs.isEmpty) "" else fs.max)
  }
  override def deserializeOffset(json: String): Offset =
    TarNameOffset(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("watermark").asText())
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[TarNameOffset].watermark
    val hi = end.asInstanceOf[TarNameOffset].watermark
    listed.filter(f => f > lo && f <= hi)
      .map(TarArchivePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    TarMembersReaderFactory(scan.maxMemberBytes, scan.confMap)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class TarNameOffset(watermark: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .createObjectNode().put("watermark", watermark).toString
}

final case class TarMembersReaderFactory(maxMemberBytes: Long,
                                         confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val TarArchivePartition(path) = partition: @unchecked
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val hp = new Path(path)
    val fsIn = hp.getFileSystem(conf).open(hp)
    val in: InputStream =
      if (path.endsWith(".gz") || path.endsWith(".tgz"))
        new GZIPInputStream(fsIn, 1 << 16)
      else fsIn
    new TarMembersPartitionReader(path, in, maxMemberBytes)
  }
}

/** One archive's member walk as a DSv2 reader — delegates the framing
  * (verified checksums, prefix-joined names, loud GNU-L refusal) to
  * [[graft.sources.TarSource.memberBytes]], so the batch object API
  * and this source cannot drift. close() is the DSv2 contract's leak
  * guard: Spark calls it on completion AND on task abort. */
final class TarMembersPartitionReader(path: String, in: InputStream,
                                      maxMemberBytes: Long)
    extends PartitionReader[InternalRow] {
  private val it = graft.sources.TarSource.memberBytes(in, path, maxMemberBytes)
  private val archive = UTF8String.fromString(path)
  private var cur: (String, Array[Byte]) = _

  override def next(): Boolean =
    if (it.hasNext) { cur = it.next(); true } else false

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      archive, UTF8String.fromString(cur._1), cur._2))

  override def close(): Unit =
    try in.close() catch { case _: java.io.IOException => () }
}
