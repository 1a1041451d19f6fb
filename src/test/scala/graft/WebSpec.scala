package graft

import org.apache.spark.sql.functions._
import graft.functions.Web

/** Literal input/output anchors for the web primitives. The oracle
  * queries mirror the same regexp chains in DuckDB — a mirrored oracle
  * would pass even if both sides shared a bug, so THESE hand-computed
  * cases are what pins the semantics. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, c: org.apache.spark.sql.Column): Any =
    Seq(in).toDF("s").select(c).head.get(0)

  test("htmlText strips script/style/comment content, tags, entities, ws") {
    val html =
      """<html><head><title>T</title>
        |<style>p { color: #333 } /* < not a tag */</style>
        |<script type="text/js">if (1 < 2) { em("<p>"); }</script>
        |</head><body><h1>Head</h1><!-- note <b> -->
        |<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>
        |</body></html>""".stripMargin
    assert(one(html, Web.htmlText(col("s"))) ===
      "T Head a & b <tag> \"q\" 's' end")
  }

  test("htmlText decodes &amp; last — &amp;lt; is literal text, not <") {
    assert(one("<p>&amp;lt;</p>", Web.htmlText(col("s"))) === "&lt;")
  }

  test("htmlText leaves unclosed script text behind (degrades, not drops)") {
    assert(one("<script>var a = 1;<p>tail", Web.htmlText(col("s"))) ===
      "var a = 1; tail")
  }

  test("htmlLinks harvests double-quoted hrefs in order, any case/spacing") {
    val html = """<a href="http://a/1">x</a><A HREF = "http://a/2">y</A>
                 |<a href='skipped'>z</a><a data-href="no">n</a>""".stripMargin
    // data-href must NOT be harvested: the pattern requires ws or < in
    // front of the attribute name, which '-' fails
    assert(one(html, Web.htmlLinks(col("s")))
      .asInstanceOf[collection.Seq[String]].toList ===
      List("http://a/1", "http://a/2"))
  }

  test("urlNormalize: case, default ports, fragments, empty path") {
    val cases = Map(
      "HTTP://WWW.Example.COM:80/Path/X?q=1#frag" -> "http://www.example.com/Path/X?q=1",
      "https://Host.CO.UK:443" -> "https://host.co.uk/",
      "https://h:8443/x" -> "https://h:8443/x", // non-default port kept
      "http://h?q=1" -> "http://h/?q=1",        // empty path, query only
      "ftp://H/x" -> "ftp://h/x"                // unknown scheme: port rule skipped
    )
    cases.foreach { case (in, want) =>
      assert(one(in, Web.urlNormalize(col("s"))) === want, s"for $in")
    }
    assert(one("mailto:x@y", Web.urlNormalize(col("s"))) === null)
    assert(one("/relative/path", Web.urlNormalize(col("s"))) === null)
  }

  test("urlHost strips userinfo and port, lowercases") {
    assert(one("https://User:Pw@Www.X.Org:8080/p", Web.urlHost(col("s"))) ===
      "www.x.org")
    assert(one("no-scheme", Web.urlHost(col("s"))) === "")
  }

  test("robotsDisallows: star group only, empty rules dropped, default-allow") {
    val robots = "User-agent: bot1\nDisallow: /private\n\n" +
      "User-agent: *\nDisallow: /admin\nDisallow:\nDisallow: /tmp/ \n\n" +
      "User-agent: bot2\nDisallow: /"
    assert(one(robots, Web.robotsDisallows(col("s")))
      .asInstanceOf[collection.Seq[String]].toList === List("/admin", "/tmp/"))
    // no star group -> nothing disallowed (REP default-allow)
    assert(one("User-agent: bot1\nDisallow: /x", Web.robotsDisallows(col("s")))
      .asInstanceOf[collection.Seq[String]].toList === Nil)
  }

  test("robotsBlocked: prefix semantics, /admin blocks /admindata too") {
    val dis = array(lit("/admin"), lit("/tmp/"))
    def blocked(p: String): Boolean =
      Seq(p).toDF("s").select(Web.robotsBlocked(col("s"), dis)).head.getBoolean(0)
    assert(blocked("/admin/x"))
    assert(blocked("/admindata")) // REP is a raw prefix match
    assert(blocked("/tmp/y"))
    assert(!blocked("/tmp"))      // "/tmp/" does not cover bare "/tmp"
    assert(!blocked("/public"))
  }

  test("registeredDomain: two labels, three under two-level suffixes") {
    val cases = Map(
      "www.example.com" -> "example.com",
      "cdn.assets.x.co.uk" -> "x.co.uk",
      "a.b.ac.jp" -> "b.ac.jp",
      "plain.org" -> "plain.org",
      "localhost" -> "")
    cases.foreach { case (in, want) =>
      assert(one(in, Web.registeredDomain(col("s"))) === want, s"for $in")
    }
  }

  test("htmlText decodes numeric entities across the full Unicode range") {
    assert(one("<p>90&#176; caf&#233; &#x41;!</p>", Web.htmlText(col("s"))) ===
      "90° café A!")
    // BMP and astral decode via the native kernel (builtin chr stops
    // at 0xFF); \u escapes here, never pasted rendered text
    assert(one("<p>&#8217;q&#8217; e&#x1F600;e</p>", Web.htmlText(col("s"))) ===
      "\u2019q\u2019 e\uD83D\uDE00e")
    // invalid: surrogate block, > 0x10FFFF, zero, malformed, overlong
    assert(one("<p>&#xD800; &#x110000; &#0; &#; &#xG1; &#12345678;</p>",
      Web.htmlText(col("s"))) ===
      "&#xD800; &#x110000; &#0; &#; &#xG1; &#12345678;")
    // double-escape: &amp;#65; yields the TEXT &#65; (numeric runs first)
    assert(one("<p>&amp;#65;</p>", Web.htmlText(col("s"))) === "&#65;")
  }

  test("robotsRules + robotsAllowed: longest match, Allow ties, wildcards") {
    val robots = "User-agent: *\nDisallow: /admin\nAllow: /admin/public\n" +
      "Disallow: /*.pdf$\nAllow: /docs/*.pdf$\nDisallow: /cgi*bin/\nAllow:\n"
    def allowed(p: String): Boolean =
      Seq((robots, p)).toDF("r", "p")
        .select(Web.robotsAllowed(col("p"), Web.robotsRules(col("r"))))
        .head.getBoolean(0)
    assert(!allowed("/admin/secret"))       // plain prefix block
    assert(allowed("/admin/public/x"))      // longer Allow overrides
    assert(!allowed("/files/a.pdf"))        // * wildcard + $ anchor
    assert(allowed("/files/a.pdfx"))        // $ anchors: .pdfx survives
    assert(allowed("/docs/a.pdf"))          // longer Allow beats /*.pdf$
    assert(!allowed("/cgi-bin/q"))          // mid-pattern *
    assert(allowed("/anything/else"))       // default-allow
    // regex metachars in a rule pattern stay literal
    val tricky = "User-agent: *\nDisallow: /a+b(c)\n"
    assert(!Seq((tricky, "/a+b(c)/d")).toDF("r", "p")
      .select(Web.robotsAllowed(col("p"), Web.robotsRules(col("r"))))
      .head.getBoolean(0))
    assert(Seq((tricky, "/aab")).toDF("r", "p")
      .select(Web.robotsAllowed(col("p"), Web.robotsRules(col("r"))))
      .head.getBoolean(0)) // '+' is not a quantifier
  }

  test("robotsRulesForAgent: most-specific named group beats *, falls back to *") {
    val body = "User-agent: bot1\nDisallow: /private\n\n" +
      "User-agent: bot1-news\nDisallow: /news\n\n" +
      "User-agent: *\nDisallow: /admin\n\n" +
      "User-agent: bot2\nDisallow: /"
    def verdict(agent: String, path: String): Boolean =
      Seq((body, path)).toDF("r", "p")
        .select(Web.robotsAllowed(col("p"),
          Web.robotsRulesForAgent(col("r"), lit(agent))))
        .head.getBoolean(0)
    // named group overrides *: bot1 ignores the * group's /admin block
    assert(verdict("bot1", "/admin/x"))
    assert(!verdict("bot1", "/private/x"))
    // longest matching token wins: bot1-NewsReader selects bot1-news
    // (prefix, len 9) over bot1 (len 4) — /private is ALLOWED for it
    assert(!verdict("bot1-NewsReader", "/news/x"))
    assert(verdict("bot1-NewsReader", "/private/x"))
    // case-insensitive token match
    assert(!verdict("BOT2", "/anything"))
    // unknown agent falls back to the * group
    assert(!verdict("nobody", "/admin/x"))
    assert(verdict("nobody", "/private/x"))
  }

  test("robotsRulesForAgent: stacked UA lines share a group; empty named group wins") {
    val stacked = "User-agent: a\nUser-agent: b\nDisallow: /x\n\n" +
      "User-agent: *\nDisallow: /y"
    def verdict(body: String, agent: String, path: String): Boolean =
      Seq((body, path)).toDF("r", "p")
        .select(Web.robotsAllowed(col("p"),
          Web.robotsRulesForAgent(col("r"), lit(agent))))
        .head.getBoolean(0)
    assert(!verdict(stacked, "a", "/x/1"))
    assert(!verdict(stacked, "b", "/x/1"))
    assert(verdict(stacked, "b", "/y/1")) // named group, not *
    assert(!verdict(stacked, "c", "/y/1")) // falls to *
    // a matching named group with NO rules means allow-all for that
    // agent (only one group applies), not fall-through to *
    val empty = "User-agent: vip\n\nUser-agent: *\nDisallow: /"
    assert(verdict(empty, "vip", "/anything"))
    assert(!verdict(empty, "other", "/anything"))
  }

  test("registeredDomainExact: snapshot keys ccTLD registries the heuristic misses") {
    val hosts = Seq("shop.x.com.cn", "www.y.co.za", "a.b.z.co.kr",
      "cdn.w.co.uk", "v.example.com", "com.cn", "localhost",
      "a.b.ck", "www.ck", "x.www.ck", "shop.y.com.bd", "b.ck")
      .toDF("host")
    val out = Web.registeredDomainExact(hosts, "host", "exact")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("shop.x.com.cn") === "x.com.cn")
    assert(out("www.y.co.za") === "y.co.za")
    assert(out("a.b.z.co.kr") === "z.co.kr")
    assert(out("cdn.w.co.uk") === "w.co.uk")
    assert(out("v.example.com") === "example.com")
    assert(out("com.cn") === "")   // host IS a public suffix
    assert(out("localhost") === "")
    // wildcard *.ck: every second-level label is a public suffix
    assert(out("a.b.ck") === "a.b.ck")
    assert(out("b.ck") === "")     // IS a suffix under *.ck
    // exception !www.ck: www.ck is itself registrable
    assert(out("www.ck") === "www.ck")
    assert(out("x.www.ck") === "www.ck")
    // wildcard *.bd
    assert(out("shop.y.com.bd") === "y.com.bd")
    // the plan must broadcast the snapshot side
    val p = Web.registeredDomainExact(hosts, "host", "exact")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"snapshot join should broadcast:\n$p")
  }

  test("registeredDomainExact: three-level entries register at four labels") {
    val hosts = Seq("school.act.edu.au", "www.school.act.edu.au",
      "act.edu.au", "dept.vic.gov.au", "uni.edu.au", "x.uni.edu.au")
      .toDF("host")
    val out = Web.registeredDomainExact(hosts, "host", "exact")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // three-level rule act.edu.au beats the two-level edu.au rule
    // (PSL most-labels precedence): registrable = last FOUR labels
    assert(out("school.act.edu.au") === "school.act.edu.au")
    assert(out("www.school.act.edu.au") === "school.act.edu.au")
    assert(out("act.edu.au") === "") // host IS the three-level suffix
    assert(out("dept.vic.gov.au") === "dept.vic.gov.au")
    // a NON-state label under edu.au still keys by the two-level rule
    assert(out("uni.edu.au") === "uni.edu.au")
    assert(out("x.uni.edu.au") === "uni.edu.au")
  }

  test("robotsAllowedCompiled == robotsAllowed on the metachar rule corpus") {
    // the compiled (constant-pattern when-chain) verdict must agree
    // with the runtime fold on every path, including wildcard/$ rules,
    // Allow-on-tie, and regex-metachar literals
    val robotsText = "User-agent: crawler\nDisallow: /a\nAllow: /a/ok\n" +
      "Disallow: /*.pdf$\nAllow: /docs/*.pdf$\nDisallow: /p+q(r)\n" +
      "Disallow: /cgi*bin/\n\nUser-agent: *\nDisallow: /"
    val rules = Web.parseRobotsForAgent(spark, robotsText, "crawler")
    assert(rules.nonEmpty)
    val paths = Seq("/a/x", "/a/ok/y", "/b/f.pdf", "/docs/d.pdf",
      "/docs/d.pdfx", "/p+q(r)/z", "/cgi-bin/q", "/cgixxbin/q", "/free")
      .toDF("p")
    val both = paths.select(col("p"),
        Web.robotsAllowed(col("p"),
          Web.robotsRulesForAgent(lit(robotsText), lit("crawler"))).as("dyn"),
        Web.robotsAllowedCompiled(col("p"), rules).as("cmp"))
      .collect()
    both.foreach { r =>
      assert(r.getBoolean(1) === r.getBoolean(2),
        s"verdict mismatch for ${r.getString(0)}")
    }
    // spot-check absolute truth, not just parity
    val m = both.map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!m("/a/x") && m("/a/ok/y") && !m("/b/f.pdf") && m("/docs/d.pdf"))
    assert(m("/docs/d.pdfx") && !m("/p+q(r)/z") && !m("/cgi-bin/q") && m("/free"))
  }

  test("parseRobotsForAgent returns bounded driver state in group order") {
    val rules = Web.parseRobotsForAgent(spark,
      "User-agent: bot\nDisallow: /x\nAllow: /x/y\n\nUser-agent: *\nDisallow: /",
      "bot")
    assert(rules === Seq(("/x", false), ("/x/y", true)))
  }

  test("sitemapEntries: url blocks parse to (loc, lastmod); absent lastmod empty") {
    import org.apache.spark.sql.functions._
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://a/x</loc><lastmod>2024-03-01</lastmod></url>" +
      "<url><loc> https://a/y </loc></url>" +
      "<url>\n  <loc>https://a/z</loc>\n  <lastmod>2023-12-31</lastmod>\n</url>" +
      "</urlset>"
    val out = Seq(xml).toDF("xml")
      .select(explode(Web.sitemapEntries(col("xml"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == 3)
    assert(out(0) == (("https://a/x", "2024-03-01")))
    assert(out(1) == (("https://a/y", "")), "trimmed loc; absent lastmod empty")
    assert(out(2) == (("https://a/z", "2023-12-31")), "multi-line url block")
    // no url blocks -> empty array, not a null/throw
    val empty = Seq("<urlset></urlset>").toDF("xml")
      .select(size(Web.sitemapEntries(col("xml"))).as("n"))
      .collect().head.getInt(0)
    assert(empty == 0)
  }
}
