package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Deterministic WARC fixture for the oracle suite: five hand-built
  * records (warcinfo, request, three responses) with the pathologies
  * the reader must survive — a payload that EMBEDS the
  * `\r\n\r\nWARC/1.0` boundary magic (with a colon'd fake header line,
  * so only the Content-Length validation rejects it during split
  * alignment), UTF-8 multibyte payload bytes, entity-encoded HTML, and
  * mixed-case URIs with default ports. The expected post-extraction
  * truth is pinned as a clean CSV for DuckDB, mirroring
  * [[IngestFixture]]'s discipline: constants derived by hand, not
  * computed by the code under test. */
object WarcFixture {

  val dir: String = FixtureDirs.base
  val warcName = "crawl_20260813.warc"
  val gzName = "crawl_20260813.warc.gz"
  val expectedCsvName = "warc_expected.csv"

  private def record(tpe: String, uri: Option[String], id: String,
                     contentType: String, payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= "WARC-Date: 2026-08-13T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  val htmlA: String =
    """<html><head><title>Example A</title><script>if(1<2){x("<b>");}</script></head><body><p>alpha &amp; beta</p></body></html>"""
  /** Embeds the record-boundary magic mid-payload; the fake header line
    * parses ("Fake: …" has a colon) but carries no Content-Length, so
    * split alignment must reject it and keep scanning. */
  val htmlB: String =
    "<html><body><pre>\r\n\r\nWARC/1.0\r\nFake: header</pre><p>gamma</p></body></html>"
  val htmlC: String =
    "<html><body><p>café &#39;é&#39;</p></body></html>"

  private def allBytes: Array[Byte] =
    record("warcinfo", None, "00000000-0000-0000-0000-000000000001",
      "application/warc-fields", "software: graft\r\n".getBytes(UTF_8)) ++
    record("request", Some("http://www.example.com/a"),
      "00000000-0000-0000-0000-000000000002", "application/http;msgtype=request",
      "GET /a HTTP/1.1\r\nHost: www.example.com\r\n\r\n".getBytes(UTF_8)) ++
    record("response", Some("http://www.example.com/a"),
      "00000000-0000-0000-0000-000000000003", "text/html", htmlA.getBytes(UTF_8)) ++
    record("response", Some("HTTPS://CDN.News.CO.UK:443/b#x"),
      "00000000-0000-0000-0000-000000000004", "text/html", htmlB.getBytes(UTF_8)) ++
    record("response", Some("http://User@Example.org:8080/c?q=1"),
      "00000000-0000-0000-0000-000000000005", "text/html", htmlC.getBytes(UTF_8))

  /** Pinned post-extraction truth: urlNormalize(target_uri) +
    * htmlText(payload) of the three response records. Quotes RFC-doubled
    * for the CSV reader; lengths are the UTF-8 byte counts. */
  private def expectedCsv: String = {
    val rows = Seq(
      ("http://www.example.com/a", htmlA.getBytes(UTF_8).length,
        "Example A alpha & beta"),
      ("https://cdn.news.co.uk/b", htmlB.getBytes(UTF_8).length,
        "WARC/1.0 Fake: header gamma"),
      ("http://user@example.org:8080/c?q=1", htmlC.getBytes(UTF_8).length,
        "café 'é'"))
    "url,content_length,main_text\n" + rows.map { case (u, l, t) =>
      s""""$u",$l,"${t.replace("\"", "\"\"")}""""
    }.mkString("", "\n", "\n")
  }

  /** Write the .warc, its .warc.gz twin (same bytes, gzipped), and the
    * expected CSV (idempotent; tiny). */
  def ensure(): String = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, warcName), allBytes)
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(Paths.get(dir, gzName)))
    gz.write(allBytes); gz.close()
    Files.write(Paths.get(dir, expectedCsvName), expectedCsv.getBytes(UTF_8))
    dir
  }

  def warcPath: String = s"$dir/$warcName"
  def gzPath: String = s"$dir/$gzName"
  def expectedCsvPath: String = s"$dir/$expectedCsvName"
}
