package graft.webtext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-grain aggregation — the first dedup/quality
  * axis of a Common-Crawl pipeline (URL-exact dedup, host blocklists,
  * per-host quality priors) runs on CANONICAL urls, not raw crawl strings.
  *
  * [[normalize]] is a hand-rolled splitter, not `java.net.URI`: crawl URLs
  * routinely violate RFC 3986 and a parser that throws (or worse, partially
  * normalizes) on 10^12 rows is a correctness hazard — unparseable inputs
  * pass through unchanged, which keeps the op total. Rules (the common
  * crawler canonicalization core):
  *  - scheme and host lowercased; leading `www.` stripped (SURT-style
  *    host folding; documented as a dedup-canonical choice, not a claim the
  *    two hosts always serve identical content)
  *  - default ports stripped (`:80` for http, `:443` for https)
  *  - fragment dropped
  *  - tracking parameters removed (`utm_*`, `gclid`, `fbclid`), remaining
  *    query-param order preserved; a now-empty query drops its `?`
  *  - path case preserved (paths are case-sensitive)
  */
object UrlOps {

  private val TrackingExact = Set("gclid", "fbclid")

  /** Split an authority into (userinfo-with-@ or "", hostport). Userinfo is
    * case-sensitive and preserved verbatim; folding rules act on hostport. */
  private def splitUserinfo(authority: String): (String, String) = {
    val at = authority.lastIndexOf('@')
    if (at < 0) ("", authority) else (authority.substring(0, at + 1), authority.substring(at + 1))
  }

  /** Port separator of a hostport, IPv6-bracket aware: the colon counts only
    * AFTER the closing `]` of a literal address. -1 when there is no port. */
  private def portIndex(hostPort: String): Int = {
    val from = if (hostPort.startsWith("[")) hostPort.indexOf(']') else 0
    if (from < 0) -1 else hostPort.indexOf(':', math.max(from, 0) + (if (hostPort.startsWith("[")) 1 else 0))
  }

  def normalize(url: String): String = {
    if (url == null) return null
    val si = url.indexOf("://")
    if (si <= 0) return url // no scheme: pass through untouched
    val scheme = url.substring(0, si).toLowerCase
    val rest = url.substring(si + 3)
    // authority ends at the first of / ? #
    var ai = rest.length
    var i = 0
    while (i < ai) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') ai = i else i += 1
    }
    val (userinfo, rawHostPort) = splitUserinfo(rest.substring(0, ai))
    var hostPort = rawHostPort.toLowerCase
    // strip ALL leading www. labels (www.www.x exists in crawls) — one-pass
    // stripping would make normalize non-idempotent, and idempotence is the
    // property that lets already-canonical tables be re-canonicalized freely.
    // Never strip the HOST part (before any port) to empty: 'www.' and
    // 'www.:8080' keep their label rather than collapse to a hostless url
    def hostNonEmpty(hp: String): Boolean = {
      val pi = portIndex(hp)
      (if (pi >= 0) hp.substring(0, pi) else hp).nonEmpty
    }
    while (hostPort.startsWith("www.") && hostNonEmpty(hostPort.substring(4)))
      hostPort = hostPort.substring(4)
    val defaultPort = if (scheme == "http") ":80" else if (scheme == "https") ":443" else ""
    if (defaultPort.nonEmpty && hostPort.endsWith(defaultPort) &&
        portIndex(hostPort) == hostPort.length - defaultPort.length)
      hostPort = hostPort.substring(0, hostPort.length - defaultPort.length)
    var tail = rest.substring(ai)
    val hi = tail.indexOf('#')
    if (hi >= 0) tail = tail.substring(0, hi) // drop fragment
    val qi = tail.indexOf('?')
    val (path, query) = if (qi >= 0) (tail.substring(0, qi), tail.substring(qi + 1)) else (tail, null)
    val cleanQuery =
      if (query == null) null
      else {
        // empty segments ('?', '?&') are dropped too, so a query emptied by
        // the filters loses its '?' — URLs differing only by a bare '?'
        // canonicalize together
        val kept = query.split("&", -1).filter { p =>
          val name = p.takeWhile(_ != '=').toLowerCase
          p.nonEmpty && !(name.startsWith("utm_") || TrackingExact.contains(name))
        }
        if (kept.isEmpty) null else kept.mkString("&")
      }
    scheme + "://" + userinfo + hostPort + path + (if (cleanQuery == null) "" else "?" + cleanQuery)
  }

  /** Host of a NORMALIZED url ("" when there is no scheme://host shape):
    * userinfo stripped, IPv6 bracket literals kept intact (minus the port). */
  def hostOf(normalizedUrl: String): String = {
    if (normalizedUrl == null) return ""
    val si = normalizedUrl.indexOf("://")
    if (si <= 0) return ""
    val rest = normalizedUrl.substring(si + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val hp = splitUserinfo(if (end < 0) rest else rest.substring(0, end))._2
    val pi = portIndex(hp)
    if (pi >= 0) hp.substring(0, pi) else hp
  }

  /** pages/docs with a `url` column -> (.., url_norm, host). Map-side; ONE
    * normalization per row (a single struct-returning UDF — two black-box
    * UDFs on the same input get no common-subexpression elimination). */
  def withNormalized(df: DataFrame): DataFrame = {
    val normHost = udf((u: String) => { val n = normalize(u); (n, hostOf(n)) })
    // scalar normalization is branchy string slicing — a UDF is appropriate
    // here (no regex-builtin composition expresses param filtering + port
    // stripping without multiple passes); it stays map-side, so the plan
    // shape (zero shuffle) is unchanged
    df.withColumn("_nh", normHost(col("url")))
      .withColumn("url_norm", col("_nh._1"))
      .withColumn("host", col("_nh._2"))
      .drop("_nh")
  }

  /** Deterministically plant MESSY crawl urls (the driver corpus has clean
    * synthetic ones): case-mangled scheme/host, `www.`, default ports,
    * tracking params in several positions, fragments — every branch of
    * [[normalize]], all pure doc_id arithmetic so the oracle recomputes the
    * canonical result directly. */
  def plantMessyUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      concat(
        when(col("doc_id") % 2 === 0, "HTTP").otherwise("HTTPS"), lit("://"),
        lit("WWW.Site"), (col("doc_id") % 7).cast("string"), lit(".Example.COM"),
        when(col("doc_id") % 3 === 0,
          when(col("doc_id") % 2 === 0, ":80").otherwise(":443")).otherwise(lit("")),
        lit("/Path/p"), (col("doc_id") % 11).cast("string"),
        when(col("doc_id") % 5 === 0,
          concat(lit("?utm_source=x&q="), (col("doc_id") % 13).cast("string")))
          .when(col("doc_id") % 5 === 1,
            concat(lit("?q="), (col("doc_id") % 13).cast("string"), lit("&utm_campaign=y")))
          .when(col("doc_id") % 5 === 2, lit("?utm_medium=z"))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, "#Frag").otherwise(lit(""))
      ).as("url"))

  /** Resolve `href` against an absolute base url. Total (never throws, never
    * returns null) — crawl hrefs are attacker-controlled garbage, so every
    * branch degrades to passing something through. Minimal RFC 3986 subset a
    * link graph needs: absolute hrefs pass through, protocol-relative (`//h`)
    * take the base scheme, rooted paths (`/p`) replace the base path,
    * query/fragment-relative (`?q`, `#f`) replace from that component, and
    * bare relative paths resolve against the base directory (no `..`
    * normalization — [[normalize]] downstream owns canonical form). */
  def resolve(base: String, href: String): String = {
    if (href == null || href.isEmpty) return if (base == null) "" else base
    if (base == null || base.isEmpty) return href
    val si = base.indexOf("://")
    if (si < 0) return href // schemeless base: nothing to resolve against
    // any scheme-prefixed href is absolute — covers "x://..." and the
    // non-hierarchical forms crawl pages carry (mailto:, tel:, javascript:,
    // data:). RFC 3986 schemes are ASCII-only (ALPHA *(ALPHA/DIGIT/+/-/.)):
    // a non-ASCII first segment with ':' is a relative path, not a scheme.
    def asciiAlpha(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    val ci = href.indexOf(':')
    if (ci > 0 && asciiAlpha(href.charAt(0)) &&
        href.substring(0, ci).forall(c =>
          asciiAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))
      return href
    val scheme = base.substring(0, si)
    if (href.startsWith("//")) return scheme + ":" + href
    val rest = base.substring(si + 3)
    var pathStart = rest.length
    var i = 0
    while (i < rest.length && pathStart == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') pathStart = i
      i += 1
    }
    val origin = scheme + "://" + rest.substring(0, pathStart)
    val tail = rest.substring(pathStart) // "" or starts with / ? #
    val c0 = href.charAt(0)
    if (c0 == '/') origin + href
    else if (c0 == '#') {
      val cut = tail.indexOf('#')
      origin + (if (cut < 0) tail else tail.substring(0, cut)) + href
    } else if (c0 == '?') {
      val q = tail.indexOf('?'); val h = tail.indexOf('#')
      val cut = if (q >= 0 && (h < 0 || q < h)) q else h
      origin + (if (cut < 0) tail else tail.substring(0, cut)) + href
    } else {
      // relative path: replace everything after the last '/' of the base
      // path (query/fragment included); a path-less base resolves at root
      val stop0 = { val q = tail.indexOf('?'); val h = tail.indexOf('#')
        if (q < 0) h else if (h < 0) q else math.min(q, h) }
      val path = if (stop0 < 0) tail else tail.substring(0, stop0)
      val dir = path.lastIndexOf('/')
      origin + (if (dir < 0) "/" else path.substring(0, dir + 1)) + href
    }
  }

  /** Host-grain rollup: docs and content bytes per canonical host — the
    * shape host blocklists and per-host quality priors consume. One hash
    * aggregation; host cardinality is ~10^7 at web scale, far below the
    * corpus, so partial aggregation collapses map-side. */
  def hostStats(df: DataFrame, contentCol: String): DataFrame =
    withNormalized(df)
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(contentCol)).cast("long")).as("total_chars"))

  /** Embedded public-suffix table (a representative slice of the PSL shape:
    * multi-label registry suffixes FIRST so longest-match wins, then the
    * single-label tails, including private-registry suffixes like github.io
    * where the "registered domain" is the user subdomain). The real list is
    * ~9k rules; the algorithm below is rule-count-independent (a when-chain
    * stays codegen-friendly into the hundreds; past that the same table
    * broadcasts and joins on the candidate-suffix explode). */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "co.in", "co.nz", "com.cn",
    "github.io", "blogspot.com", "herokuapp.com",
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "dev", "app",
    "uk", "au", "jp", "br", "in", "nz", "cn", "de", "fr", "us")

  /** (host) -> (suffix, registered_domain): eTLD+1 extraction, the grain
    * host blocklists / per-site quality priors / crawl politeness actually
    * key on (grouping `a.cdn.site.co.uk` with `www.site.co.uk`). PSL
    * semantics: longest matching suffix wins; a host that IS a bare public
    * suffix has no registrable domain (empty, never null — hash-compared
    * surface); an unknown TLD falls back to the prevailing rule (last label
    * = suffix, last two labels = registered); IPv4 literals and single-label
    * hosts register as themselves with an empty suffix.
    *
    * Pure builtin Columns (ordered when-chain + anchored regexp_extract) —
    * map-side, whole-stage codegen, no UDF. */
  def withRegisteredDomain(df: DataFrame, hostCol: String = "host"): DataFrame = {
    val h = col(hostCol)
    def rx(s: String) = s.replace(".", "\\.")
    val isIp = h.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$")
    val single = !h.contains(".")
    val ordered = PublicSuffixes.sortBy(s => (-s.count(_ == '.'), s))
    val matched = ordered.foldLeft(when(lit(false), lit("")): Column) { (acc, s) =>
      acc.when(h === s || h.endsWith("." + s), lit(s))
    }
    // unknown TLD: prevailing rule — last label is the suffix; unknown
    // single-label hosts (localhost) have no suffix at all
    val suffix = when(isIp, lit(""))
      .otherwise(coalesce(matched,
        when(single, lit("")).otherwise(regexp_extract(h, "\\.([^.]+)$", 1))))
    // one label + the (escaped) suffix, anchored at the end; built per list
    // branch so every regexp pattern is a literal (compiled once); NULL when
    // the suffix came from the prevailing rule -> last-two-labels fallback.
    // Each branch repeats the MATCH CONDITION instead of comparing against
    // `matched`: the chains share branch order, so first-hit-wins picks the
    // same suffix — but `matched === s` would inline the whole 37-branch
    // `matched` tree into every branch (~1.4k nested CASEs), which overflows
    // Janino's 64 KB method limit and silently drops the scan to interpreted
    // eval (measured: whole-stage codegen disabled on registered_domain /
    // domain_pareto). The linear form stays codegen-compiled.
    val listReg = ordered.foldLeft(when(lit(false), lit("")): Column) { (acc, s) =>
      acc.when(h === s || h.endsWith("." + s),
        regexp_extract(h, "([^.]+\\." + rx(s) + ")$", 1))
    }
    val reg = when(isIp, h)
      .when(h === suffix, lit("")) // bare public suffix (any label count)
      .when(single, h)             // unknown single label registers itself
      .otherwise(coalesce(listReg, regexp_extract(h, "([^.]+\\.[^.]+)$", 1)))
    df.withColumn("suffix", suffix).withColumn("registered_domain", reg)
  }

  /** Deterministically plant hosts covering every [[withRegisteredDomain]]
    * branch (the driver corpus only has site{0..6}.example.com): ccTLD
    * second-level registries, private-registry suffixes, deep subdomains,
    * bare suffixes, unknown TLDs, IPv4 literals, single-label hosts. */
  def plantHosts(docs: DataFrame): DataFrame = plantHosts(docs, Nil)

  /** [[plantHosts]] carrying extra input columns through the planting, so
    * downstream consumers that need (host, text) avoid a doc-grain re-join. */
  def plantHosts(docs: DataFrame, keep: Seq[String]): DataFrame = {
    val id = col("doc_id")
    val m = id % 10
    docs.select((id.as("doc_id") +: keep.map(col) :+
      when(m === 0, concat(lit("www.news"), (id % 5).cast("string"), lit(".co.uk")))
        .when(m === 1, concat(lit("blog"), (id % 7).cast("string"), lit(".github.io")))
        .when(m === 2, concat(lit("site"), (id % 7).cast("string"), lit(".example.com")))
        .when(m === 3, when(id % 9 === 0, lit("co.uk"))
          .otherwise(concat(lit("media.corp"), (id % 3).cast("string"), lit(".com.au"))))
        .when(m === 4, concat(lit("a.b.deep"), (id % 4).cast("string"), lit(".org")))
        .when(m === 5, concat(lit("cdn"), (id % 6).cast("string"), lit(".net")))
        .when(m === 6, concat(lit("shop"), (id % 5).cast("string"), lit(".co.jp")))
        .when(m === 7, concat(lit("192.168."), (id % 4).cast("string"), lit(".10")))
        .when(m === 8, lit("intranet.example.zz"))
        .otherwise(lit("localhost")).as("host")): _*)
  }

  /** Pareto coverage of the token mass by registered domain — the corpus
    * concentration report a crawl-budget / mixture decision starts from:
    * domains ranked by token count with cumulative share, so "the top k
    * domains carry p% of the corpus" reads straight off the table.
    *
    * Scale shape: ONE corpus aggregation down to registered-domain grain
    * (map-side partial sums; ~10^7 domains at 10^12 docs), then the rank /
    * cumulative-share window runs on that domain-grain table — report-sized
    * state, never corpus-grain (the single-task-window ban in CLAUDE.md is
    * about corpus grain; a bounded domain roll-up is where a global ordered
    * window is the right plan). Integer bp shares, trunc division. */
  def domainPareto(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = withRegisteredDomain(plantHosts(docs, Seq("text")))
    val byDom = base
      .groupBy(col("registered_domain").as("domain"))
      .agg(sum(size(split(col("text"), " ", -1)).cast("long")).as("n_tokens"))
    val w = Window.orderBy(col("n_tokens").desc, col("domain"))
    val ranked = byDom.select(col("domain"), col("n_tokens"),
      row_number().over(w).cast("long").as("rnk"),
      sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum_tokens"))
    val total = byDom.agg(sum("n_tokens").as("tt"))
    ranked.crossJoin(broadcast(total))
      .select(col("domain"), col("n_tokens"), col("rnk"), col("cum_tokens"),
        expr("cum_tokens * 10000L div tt").as("cum_share_bp"))
  }
}
