package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML and URL primitives for web-corpus curation — the front door of
  * a web-scale training pipeline: strip a crawled page to its main
  * text, harvest its outlinks, and canonicalize URLs so per-domain
  * policies ([[graft.operators.Sampling.domainCap]], crawl-frontier
  * dedup) key on a stable value.
  *
  * Everything here is a composition of codegen'd `regexp_replace` /
  * `regexp_extract` / literal `replace` calls — one narrow projection,
  * no UDFs, no shuffle; at 100 TB these run at scan speed inside
  * whole-stage codegen. The patterns are deliberately restricted to
  * the common subset of Java regex and RE2 (no backreferences, no
  * lookaround, no `\s` — whose character class differs between the
  * engines — and no group references in replacement strings, where
  * Java's `$1` and RE2's `\1` diverge) so an external engine can
  * replay them byte-for-byte.
  */
object Web {

  /** Whitespace class shared verbatim by Java regex and RE2 (`\s`
    * differs between them: Java adds U+000B, RE2 adds U+000C). */
  private val Ws = "[ \\t\\r\\n]+"

  /** Main-text extraction from an HTML page: drop `<script>`,
    * `<style>` and comment blocks (their CONTENT must not leak into
    * the text — a `<` inside inline JavaScript would otherwise derail
    * the generic tag strip), collapse every remaining tag to a space,
    * decode the six ubiquitous entities (`&amp;` LAST, so
    * `&amp;lt;` decodes to the literal text `&lt;` rather than
    * double-decoding to `<`), then squeeze whitespace. An UNCLOSED
    * script/style block is left for the generic tag strip, which
    * removes its tags but keeps its text — malformed input degrades
    * to noisy text rather than dropping the document. */
  def htmlText(html: Column): Column = {
    val noScript  = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle   = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags    = regexp_replace(noComment, "<[^>]+>", " ")
    // numeric refs (&#NNN;/&#xNN;) decode FIRST — full Unicode range
    // via the native kernel (Spark's builtin chr is mod-256 above
    // 0xFF, so a builtin composition couldn't decode the very common
    // &#8217; curly quote) — then the named chain with &amp; LAST, so
    // &amp;#65; yields the literal text &#65;. The rare double-escape
    // &#38;amp; decodes all the way to '&' under this order; both
    // engines replay the same order, so the choice is pinned.
    val numeric = graft.plans.UnicodeExpressions.decode_html_entities(noTags)
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(numeric) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, Ws, " "))
  }

  /** Every double-quoted `href` value on the page, in document order
    * (`array<string>`; explode for one row per outlink). Unquoted and
    * single-quoted attributes are skipped — on crawl data the quoted
    * form dominates and a permissive pattern would harvest garbage.
    * The attribute name must follow whitespace or `<` (RE2 has no
    * lookbehind and `\b` sits after the `-` of `data-href` too, so the
    * guard is a consumed character class and the URL is group 2) —
    * without it `data-href="…"` template attributes pollute the link
    * graph. */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)(^|[ \\t\\r\\n<])href[ \\t\\r\\n]*=[ \\t\\r\\n]*\"([^\"]*)\""),
      lit(2))

  /** Lowercased host of an absolute URL: authority minus userinfo and
    * port. Empty string when `url` has no `scheme://` part. */
  def urlHost(url: Column): Column = {
    val auth = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", "")
  }

  /** Canonical form of an absolute URL: scheme and authority
    * lowercased, default port dropped (`:80` for http, `:443` for
    * https), fragment removed, empty path normalized to `/` (so
    * `http://x.com` and `http://x.com/` key identically in a
    * frontier-dedup join). Path and query are preserved byte-for-byte
    * — percent-decoding is NOT attempted (decoding can change which
    * resource the URL names). Returns NULL for anything that is not
    * an absolute URL (no `scheme://`): relative links, `mailto:`,
    * `javascript:` — the caller filters, loudly, rather than
    * receiving a silently mangled key. */
  def urlNormalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val authNoPort = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val rest = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val path = when(rest === "", lit("/"))
      .when(rest.startsWith("?"), concat(lit("/"), rest))
      .otherwise(rest)
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), authNoPort, path))
  }

  /** The `Disallow:` path prefixes a crawler honoring REP (RFC 9309)
    * must skip, extracted from the FIRST `User-agent: *` group of a
    * robots.txt body. Rules scoped to named agents are ignored, empty
    * `Disallow:` values (allow-all markers) are dropped, and a body
    * with no `*` group yields an empty array — nothing blocked, which
    * is REP's default-allow. Deliberately a simplification of full REP
    * (no `Allow:` precedence, no wildcards in paths, first `*` group
    * only) — the prefix-match core covers the overwhelming majority of
    * real robots files and stays replayable in an external engine. */
  def robotsDisallows(robotsTxt: Column): Column = {
    val starBlock = regexp_extract(robotsTxt,
      "(?is)user-agent:[ \\t]*\\*[ \\t\\r]*\\n(.*?)(\\nuser-agent:|$)", 1)
    filter(
      transform(
        regexp_extract_all(starBlock,
          lit("(?i)disallow:[ \\t]*([^\\r\\n#]*)"), lit(1)),
        d => trim(d)),
      d => d =!= "")
  }

  /** REP prefix match: is `path` under any of the disallowed
    * prefixes? Pair with [[robotsDisallows]] to drop impolitely
    * crawled URLs from a corpus. */
  def robotsBlocked(path: Column, disallows: Column): Column =
    exists(disallows, d => path.startsWith(d))

  /** Full RFC 9309 rule set from the first `User-agent: *` group:
    * BOTH `Allow:` and `Disallow:` lines, in order, as
    * `array<struct<pat: string, allow: boolean>>`. Empty-valued lines
    * (allow-all markers) are dropped; a body with no `*` group yields
    * an empty array — REP's default-allow. Feed to [[robotsAllowed]]
    * for longest-match precedence with `*`/`$` wildcards — the part
    * of REP [[robotsDisallows]] deliberately skipped (e.g.
    * `Allow: /public` under `Disallow: /`, which real sites rely
    * on). */
  def robotsRules(robotsTxt: Column): Column = {
    val starBlock = regexp_extract(robotsTxt,
      "(?is)user-agent:[ \\t]*\\*[ \\t\\r]*\\n(.*?)(\\nuser-agent:|$)", 1)
    filter(
      transform(split(starBlock, "\n"), l => {
        val dis = trim(regexp_extract(l, "(?i)^[ \\t]*disallow:[ \\t]*([^\\r\\n#]*)", 1))
        val alw = trim(regexp_extract(l, "(?i)^[ \\t]*allow:[ \\t]*([^\\r\\n#]*)", 1))
        struct(
          when(dis =!= "", dis).otherwise(alw).as("pat"),
          (dis === "").as("allow"))
      }),
      r => r.getField("pat") =!= "")
  }

  /** RFC 9309 §2.2.1 named-agent group selection: the rule set of the
    * group whose `User-agent:` token most specifically matches
    * `agent` — a group token matches when it is `*` (specificity 0)
    * or a case-insensitive PREFIX of the crawler's product token
    * (specificity = token length, the Googlebot-News-obeys-googlebot
    * convention); the highest specificity wins, first group on ties,
    * and a crawler with a matching NAMED group ignores the `*` group
    * entirely (even when the named group is empty — RFC's "only one
    * group applies"). Stacked `User-agent:` lines share one group
    * (a run of UA lines is a single group header). Implemented as ONE
    * sequential fold over the body's lines (groups are positional
    * state — blank lines do NOT terminate a group in RFC 9309, only
    * the next UA-line run does), so it composes per-ROW like
    * [[robotsRules]]: rule bodies are per-domain and tiny, the fold
    * is linear in body lines. Feed the result to [[robotsAllowed]]. */
  def robotsRulesForAgent(robotsTxt: Column, agent: Column): Column = {
    val emptyRules = array().cast("array<struct<pat:string,allow:boolean>>")
    val agentLc = lower(agent)
    val zero = struct(
      lit(-1L).as("best_score"), emptyRules.as("best"),
      lit(-1L).as("cur_score"), emptyRules.as("cur"),
      lit(false).as("in_run"))
    def step(acc: Column, l: Column): Column = {
      val uaTok = trim(regexp_extract(l,
        "(?i)^[ \\t]*user-agent:[ \\t]*([^\\r\\n#]*)", 1))
      val isUa = uaTok =!= ""
      val dis = trim(regexp_extract(l,
        "(?i)^[ \\t]*disallow:[ \\t]*([^\\r\\n#]*)", 1))
      val alw = trim(regexp_extract(l,
        "(?i)^[ \\t]*allow:[ \\t]*([^\\r\\n#]*)", 1))
      val pat = when(dis =!= "", dis).otherwise(alw)
      val isRule = pat =!= ""
      val tokScore = when(uaTok === "*", lit(0L))
        .when(agentLc.startsWith(lower(uaTok)), length(uaTok).cast("long"))
        .otherwise(lit(-1L))
      val bs = acc.getField("best_score"); val b = acc.getField("best")
      val cs = acc.getField("cur_score"); val c = acc.getField("cur")
      val inRun = acc.getField("in_run")
      // closing the current group: promote it over best on STRICTLY
      // greater specificity (ties keep the earlier group)
      val promote = cs > bs
      val nbs = when(promote, cs).otherwise(bs)
      val nb = when(promote, c).otherwise(b)
      when(isUa && inRun, // stacked UA line: same group, best token wins
        struct(bs.as("best_score"), b.as("best"),
          greatest(cs, tokScore).as("cur_score"), c.as("cur"),
          lit(true).as("in_run")))
        .when(isUa, // new UA run: finalize the previous group
          struct(nbs.as("best_score"), nb.as("best"),
            tokScore.as("cur_score"), emptyRules.as("cur"),
            lit(true).as("in_run")))
        .when(isRule,
          struct(bs.as("best_score"), b.as("best"),
            cs.as("cur_score"),
            concat(c, array(struct(pat.as("pat"), (dis === "").as("allow"))))
              .as("cur"),
            lit(false).as("in_run")))
        .otherwise( // blank/comment/other: ends a UA run, keeps the group
          struct(bs.as("best_score"), b.as("best"),
            cs.as("cur_score"), c.as("cur"), lit(false).as("in_run")))
    }
    aggregate(split(robotsTxt, "\n"), zero, step,
      acc => when(acc.getField("cur_score") > acc.getField("best_score"),
        acc.getField("cur")).otherwise(acc.getField("best")))
  }

  /** RFC 9309 group-matching verdict for one path: the MOST SPECIFIC
    * matching rule wins (most pattern octets — length of the raw
    * pattern including wildcards, the rule Google's reference parser
    * implements), Allow beating Disallow on ties; no matching rule is
    * allow. Patterns support REP's two wildcards: `*` (any run) and a
    * TRAILING `$` (end anchor). Each pattern is compiled to an
    * anchored regex with literal replaces only (no group references
    * in replacements — Java `$1` vs RE2 `\1` diverge): escape every
    * shared metachar with backslash-first ordering, then `*` → `.*`.
    * The per-element regex is data-driven (compiled per row), which
    * is fine where it runs: rule arrays are per-DOMAIN and tiny,
    * never corpus-length. */
  def robotsAllowed(path: Column, rules: Column): Column = {
    def toRegex(p: Column): Column = {
      val anchored = p.endsWith("$")
      val core = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
      val esc = Seq("\\", ".", "+", "?", "[", "]", "(", ")", "^", "$", "|", "{", "}")
        .foldLeft(core)((c, ch) => replace(c, lit(ch), lit("\\" + ch)))
      concat(lit("^"), replace(esc, lit("*"), lit(".*")),
        when(anchored, lit("$")).otherwise(lit("")))
    }
    val best = aggregate(rules,
      struct(lit(-1L).as("len"), lit(true).as("allow")),
      (acc, r) => {
        val m = regexp_like(path, toRegex(r.getField("pat")))
        val rl = length(r.getField("pat")).cast("long")
        val better = m && (rl > acc.getField("len") ||
          (rl === acc.getField("len") && r.getField("allow") &&
            !acc.getField("allow")))
        when(better,
          struct(rl.as("len"), r.getField("allow").as("allow")))
          .otherwise(acc)
      })
    best.getField("allow")
  }

  /** Scala twin of [[robotsAllowed]]'s per-rule regex compile — the
    * SAME escape chain in the same order (backslash first, `*` →
    * `.*`, trailing `$` re-anchored), so a driver-side compiled
    * verdict matches the column-expression verdict bit-for-bit
    * (WebSpec pins the parity on the metachar corpus). */
  def robotsPatternRegex(p: String): String = {
    val anchored = p.endsWith("$")
    val core = if (anchored) p.dropRight(1) else p
    val esc = Seq("\\", ".", "+", "?", "[", "]", "(", ")", "^", "$", "|", "{", "}")
      .foldLeft(core)((c, ch) => c.replace(ch, "\\" + ch))
    "^" + esc.replace("*", ".*") + (if (anchored) "$" else "")
  }

  /** Parse a CONSTANT robots.txt for one agent ONCE, driver-side,
    * through the real [[robotsRulesForAgent]] expression (a 1-row
    * plan — the group-selection fold is exercised, not reimplemented)
    * and return the bounded rule set as driver model state. The
    * robots-config sibling of collecting BPE merges: when the crawler
    * config is one literal robots body, re-running the per-line parse
    * fold for every corpus row is pure waste — rules are per-site
    * bounded state and belong in the PLAN, not the row loop.
    * Per-site rule COLUMNS (the q_robots_by_domain deployment shape)
    * still use the expression forms directly. */
  def parseRobotsForAgent(spark: org.apache.spark.sql.SparkSession,
      robotsTxt: String, agent: String): Seq[(String, Boolean)] =
    spark.range(1)
      .select(robotsRulesForAgent(lit(robotsTxt), lit(agent)).as("r"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getBoolean(1)))

  /** RFC 9309 verdict for one path against a DRIVER-KNOWN rule set:
    * rules sort once by (pattern octets desc, Allow first) — the
    * longest-match / Allow-on-ties precedence [[robotsAllowed]]
    * computes with its runtime fold — and compile to a when-chain of
    * CONSTANT-pattern regexes, so every regex is compiled once at
    * codegen instead of per row per rule. Semantically identical to
    * `robotsAllowed(path, <same rules>)` for every path (first match
    * in (len desc, allow desc) order IS the fold's argmax; WebSpec
    * pins the equivalence). The 100 TB shape for a fixed crawler
    * config: rule-set size is per-site bounded, path volume is not. */
  def robotsAllowedCompiled(path: Column,
      rules: Seq[(String, Boolean)]): Column =
    rules.sortBy { case (p, a) => (-p.length, !a) }
      .foldRight(lit(true)) { case ((p, a), els) =>
        when(path.rlike(robotsPatternRegex(p)), lit(a)).otherwise(els)
      }

  /** Registrable domain of a host — the right key for per-domain caps:
    * subdomains of one registrant (`cdn.x.co.uk`, `www.x.co.uk`) must
    * count against ONE budget. Last two labels, except under the
    * common two-level public suffixes (`co.uk`, `com.au`, …) where it
    * is the last three. The suffix list is a deliberately small
    * HEURISTIC subset of the Mozilla Public Suffix List (the full list
    * is ~9k entries and changes monthly; callers needing exactness
    * should join against a maintained snapshot instead). Empty string
    * for single-label hosts (`localhost`). The alternation relies on
    * leftmost-FIRST branch choice, which Java regex and RE2 (Perl
    * mode) share. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host,
      "([^.]+\\.(?:ac|co|com|edu|gov|net|org)\\.(?:au|br|in|jp|nz|uk)|[^.]+\\.[^.]+)$",
      1)

  /** Pinned public-suffix snapshot rules (see the resource file header
    * for scope): (exact two-level suffixes, wildcard TLDs from `*.tld`
    * lines, exception suffixes from `!name.tld` lines). Bounded model
    * state: a few hundred entries, loaded once per JVM from the
    * library's own classpath — no network, no environment. */
  lazy val pslRules: (Seq[String], Seq[String], Seq[String]) = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.txt")
    require(in != null, "psl_snapshot.txt missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
      finally in.close()
    val (exc, rest) = lines.partition(_.startsWith("!"))
    val (wild, exact) = rest.partition(_.startsWith("*."))
    (exact, wild.map(_.stripPrefix("*.")), exc.map(_.stripPrefix("!")))
  }

  /** The exact two-level suffix entries of [[pslRules]] — the broadcast
    * join side of [[registeredDomainExact]]. */
  lazy val pslSnapshot: Seq[String] = pslRules._1

  /** EXACT registrable domain via the pinned snapshot — the
    * broadcast-join variant [[registeredDomain]]'s scaladoc points
    * callers at. Rule matching follows the PSL algorithm's
    * most-labels-wins order:
    *  - last THREE labels match an exact three-level entry
    *    (`act.edu.au` family) → register at the last FOUR labels;
    *  - else last two labels match an exact two-level entry, OR the
    *    TLD carries a wildcard rule (`*.ck`: every second-level label
    *    is a suffix) and the two labels are not an exception
    *    (`!www.ck`) → register at the last THREE labels;
    *  - else the PSL's implicit `*` default → the last two labels.
    * `''` for single-label hosts and for hosts that ARE a public
    * suffix. Both exact tiers are broadcast hash join sides (a few
    * hundred rows each) — map-side probes, the corpus never shuffles;
    * wildcard TLDs and exceptions are tiny literal IN-lists in the
    * same projection. The heuristic column function stays the
    * zero-join default for callers that can tolerate last-two-labels
    * on the uncommon ccTLD registries. */
  def registeredDomainExact(df: DataFrame, hostCol: String,
      out: String = "registered_domain"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (exact, wild, exc) = pslRules
    val (exact3, exact2) = exact.partition(_.count(_ == '.') == 2)
    val psl2 = exact2.toDF("psl_suffix")
    val psl3 = exact3.toDF("psl3_suffix")
    val h = lower(col(hostCol))
    val wildcardHit = col("__tld").isin(wild: _*) &&
      !col("__t2").isin(exc: _*) && col("__t2").contains(".")
    df.withColumn("__t2", regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .withColumn("__t3", regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .withColumn("__t4",
        regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1))
      .withColumn("__tld", regexp_extract(h, "([^.]+)$", 1))
      .join(broadcast(psl2), col("__t2") === col("psl_suffix"), "left")
      .join(broadcast(psl3), col("__t3") === col("psl3_suffix"), "left")
      .withColumn(out,
        when(col("psl3_suffix").isNotNull, col("__t4"))
          .when(col("psl_suffix").isNotNull || wildcardHit, col("__t3"))
          .otherwise(col("__t2")))
      .drop("__t2", "__t3", "__t4", "__tld", "psl_suffix", "psl3_suffix")
  }

  /** Parse an XML sitemap (sitemaps.org protocol) into its url
    * entries: array of (loc, lastmod) structs, empty lastmod when the
    * optional tag is absent. Same engine-portable regex subset as the
    * rest of this layer (non-greedy groups, no lookaround), `(?s)` so
    * pretty-printed multi-line sitemaps parse too — feeds the
    * incremental-fetch planner: entries with lastmod past the last
    * cycle's cutoff become next cycle's candidates, everything else
    * is skipped without a request (the fetch half of the reference's
    * incremental-sync economics, applied before any fetch happens). */
  def sitemapEntries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)),
      u => struct(
        trim(regexp_extract(u, "(?s)<loc>(.*?)</loc>", 1)).as("loc"),
        trim(regexp_extract(u, "(?s)<lastmod>(.*?)</lastmod>", 1))
          .as("lastmod")))
}
