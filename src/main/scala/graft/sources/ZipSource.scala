package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.Charset
import java.util.zip.ZipInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

/** Zip ingestion (reference S4: `unzip -p $file` piped into `.import`,
  * `bin/fetcher.bash:96,120`).
  *
  * Spark has no native zip source, and zip is not splittable — one task
  * must own one archive. Two design points for 100 TB posture:
  *
  *  - **Streaming decode, constant memory**: we do NOT use the
  *    `binaryFile` format (it materializes the whole archive in one
  *    row, 2 GB hard limit). Instead the archive paths are parallelized
  *    one-per-partition and each task streams
  *    `FSDataInputStream → ZipInputStream → BufferedReader` line by
  *    line — the Spark analog of the reference's
  *    `unzip -p | iconv | …` Unix pipe, with the charset decode fused
  *    into the reader.
  *  - **Repartition after decode**: downstream parallelism must not be
  *    limited by archive count, so callers should `repartition` the
  *    parsed result before wide ops (the parse in [[RawTable.parseLines]]
  *    redistributes naturally on first shuffle).
  */
object ZipSource {

  /** Close the underlying stream when the TASK completes, not only at
    * EOF: a downstream limit/take can abandon the line iterator before
    * exhaustion, and the on-exhaustion close alone would then leak the
    * open FSDataInputStream (and the zip inflater's native buffer) for
    * the executor's lifetime — the Deflater-cleanup precedent in
    * TextAnalysis.compressionRatios. close() is idempotent, so the
    * happy-path EOF close composes safely. */
  private def closeOnTaskEnd(c: java.io.Closeable): Unit =
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit] { _ =>
        try c.close() catch { case _: java.io.IOException => () }
      })

  /** All text lines of every entry of each archive, decoded with the
    * given charset. One input partition per archive (zip is not
    * splittable); the header line of the FIRST entry is kept and
    * subsequent entries' first lines are kept too (reference semantics:
    * `unzip -p` concatenates entries; NC archives hold a single file). */
  def lines(spark: SparkSession, paths: Seq[String], charset: Charset): Dataset[String] =
    charsetLines(spark, paths, charset, zipped = true)

  /** Charset-aware line reader for plain (non-zip) files. Needed
    * because Spark's `text` source silently IGNORES any encoding
    * option — it is UTF-8 only — so LATIN1/UTF-16 sources that must be
    * line-repaired before parsing cannot go through it. Same streaming
    * decode as the zip path, minus the ZipInputStream. */
  def textLines(spark: SparkSession, paths: Seq[String], charset: Charset): Dataset[String] =
    charsetLines(spark, paths, charset, zipped = false)

  private def charsetLines(spark: SparkSession, paths: Seq[String],
                           charset: Charset, zipped: Boolean): Dataset[String] = {
    import spark.implicits._
    val serConf = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator() match {
        case it =>
          val m = scala.collection.mutable.Map[String, String]()
          while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue }
          m.toMap
      })
    val charsetName = charset.name() // Charset itself is not serializable
    spark.createDataset(paths)
      .repartition(paths.size)
      .mapPartitions { pathIt =>
        val cs = Charset.forName(charsetName)
        val conf = new Configuration(false)
        serConf.value.foreach { case (k, v) => conf.set(k, v) }
        pathIt.flatMap { p =>
          val hPath = new Path(p)
          val fs = hPath.getFileSystem(conf)
          if (!zipped) {
            val reader = new BufferedReader(new InputStreamReader(
              ArchiveStreamAudit.wrap(fs.open(hPath)), cs))
            closeOnTaskEnd(reader)
            new Iterator[String] {
              private var nextLine: String = reader.readLine()
              def hasNext: Boolean = nextLine != null
              def next(): String = {
                val l = nextLine
                nextLine = reader.readLine()
                if (nextLine == null) reader.close()
                l
              }
            }
          } else {
          val zin = new ZipInputStream(ArchiveStreamAudit.wrap(fs.open(hPath)))
          closeOnTaskEnd(zin)
          // Iterator over all lines of all entries, streaming.
          new Iterator[String] {
            private var reader: BufferedReader = _
            private var nextLine: String = advance()
            private def advance(): String = {
              while (true) {
                if (reader != null) {
                  val l = reader.readLine()
                  if (l != null) return l
                  reader = null
                }
                val entry = zin.getNextEntry
                if (entry == null) { zin.close(); return null }
                if (!entry.isDirectory)
                  reader = new BufferedReader(new InputStreamReader(zin, cs))
              }
              null
            }
            def hasNext: Boolean = nextLine != null
            def next(): String = {
              val l = nextLine; nextLine = advance(); l
            }
          }
          }
        }
      }
  }
}
