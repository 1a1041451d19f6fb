package graft

import org.apache.spark.sql.functions._
import graft.sources.WarcFixture

class WarcSourceSpec extends SparkSpec {

  private lazy val path = { WarcFixture.ensure(); WarcFixture.warcPath }

  test("reads every record with headers, offsets, and exact payload bytes") {
    val rows = spark.read.format("warc").load(path)
      .orderBy("record_offset").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ===
      Seq("warcinfo", "request", "response", "response", "response"))
    assert(rows(0).getAs[String]("target_uri") === null)
    assert(rows(2).getAs[String]("target_uri") === "http://www.example.com/a")
    assert(rows.map(_.getAs[Long]("record_offset")).toSeq ===
      rows.map(_.getAs[Long]("record_offset")).toSeq.sorted)
    // payload bytes are byte-faithful, UTF-8 multibyte included
    assert(new String(rows(4).getAs[Array[Byte]]("payload"), "UTF-8") ===
      WarcFixture.htmlC)
    assert(rows(3).getAs[Long]("content_length") ===
      WarcFixture.htmlB.getBytes("UTF-8").length.toLong)
  }

  test("tiny splits read the same records once each (false magic rejected)") {
    val whole = spark.read.format("warc").load(path)
      .select("record_offset", "warc_type", "target_uri", "content_length")
      .orderBy("record_offset").collect().toSeq
    // 64-byte splits put boundaries inside every record, including
    // inside htmlB's embedded \r\n\r\nWARC/1.0 fake magic — alignment
    // must reject the fake (no Content-Length) and neither lose nor
    // duplicate a record
    val split = spark.read.format("warc").option("splitSize", "64").load(path)
      .select("record_offset", "warc_type", "target_uri", "content_length")
      .orderBy("record_offset").collect().toSeq
    assert(split === whole)
  }

  test("warc.gz decodes to the same rows (whole-file partition)") {
    val plain = spark.read.format("warc").load(path)
      .select("record_offset", "warc_type", "content_length")
      .orderBy("record_offset").collect().toSeq
    val gz = spark.read.format("warc").load(WarcFixture.gzPath)
      .select("record_offset", "warc_type", "content_length")
      .orderBy("record_offset").collect().toSeq
    assert(gz === plain)
  }

  test("metadata-only projection skips payloads and still counts right") {
    val counts = spark.read.format("warc").load(path)
      .groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("warcinfo" -> 1L, "request" -> 1L, "response" -> 3L))
  }

  test("oversized payload fails loudly, not silently truncated") {
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").option("maxPayloadBytes", "10").load(path)
        .count()
    }
    assert(e.getMessage.contains("maxPayloadBytes") ||
      Option(e.getCause).exists(_.getMessage.contains("maxPayloadBytes")))
  }
}
