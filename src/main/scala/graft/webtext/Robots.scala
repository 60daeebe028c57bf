package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt politeness gate — the crawl-side admission filter every
  * Common-Crawl-style corpus is built behind (reference scope: PagePlus
  * consumes already-fetched pages; a from-scratch web-text engine must also
  * model the fetch-policy stage that decides which urls exist at all).
  *
  * Parser implements the RFC 9309 subset that matters on real robots files:
  *   - `key: value` lines, keys case-insensitive, `#` comments to EOL;
  *   - consecutive `User-agent` lines form one group header; a new group
  *     starts at a `User-agent` line that follows at least one rule;
  *   - group selection: all groups whose agent token equals the crawler's
  *     product token (case-insensitive) merge; if none, the `*` groups; if
  *     neither exists, everything is allowed;
  *   - rule match: `Allow`/`Disallow` path patterns with `*` wildcards and
  *     an optional `$` end anchor; empty `Disallow:` matches nothing;
  *   - decision: the longest (most-specific, by pattern length) matching
  *     rule wins; at equal length Allow beats Disallow; no match = allowed;
  *   - `Crawl-delay` is group-scoped (non-standard but ubiquitous).
  *
  * Scale shape: robots bodies live at HOST grain (≪ corpus — ~10^8 hosts vs
  * 10^12 pages), so the decision join broadcasts-or-shuffles the tiny side
  * and evaluation is map-side. Each partition parses a given host's robots
  * ONCE into a rule list via a per-partition cache ([[decisions]]), so the
  * per-row cost is the longest-match walk, not a re-parse — the classic
  * parse-once-per-distinct-key-per-partition move; pre-partitioning urls by
  * host turns the cache into exactly one parse per host per partition.
  */
object Robots {

  /** One path rule. `pattern` may contain `*` wildcards and a trailing `$`. */
  final case class Rule(allow: Boolean, pattern: String)

  /** A user-agent group: agent tokens (lowercased), rules in file order,
    * optional crawl-delay seconds. */
  final case class Group(agents: Vector[String], rules: Vector[Rule], crawlDelay: Option[Long])

  /** Parse a robots.txt body into its groups. Total: unknown directives and
    * malformed lines are skipped (RFC 9309 §2.2.3), never thrown on. */
  def parseGroups(robots: String): Vector[Group] = {
    if (robots == null) return Vector.empty
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Long] = None
    var open = false // saw a User-agent; group not yet flushed
    var sawRule = false // a rule line closed the agent-header run
    def flush(): Unit = {
      if (open) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
      open = false; sawRule = false
    }
    for (raw <- robots.split("\n", -1)) {
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (sawRule) flush()
            agents :+= value.toLowerCase
            open = true
          case "allow" | "disallow" if open =>
            sawRule = true
            // empty Disallow ("everything allowed") matches nothing — drop it
            if (value.nonEmpty) rules :+= Rule(allow = key == "allow", pattern = value)
          case "crawl-delay" if open =>
            sawRule = true
            delay = scala.util.Try(value.toLong).toOption.orElse(delay)
          case _ => if (open && key.nonEmpty) sawRule = true // unknown directive still ends the header run
        }
      }
    }
    flush()
    groups.result()
  }

  /** Merge the groups that apply to `agent` (RFC 9309 §2.2.1: exact product
    * token match, else the `*` groups, else no rules). */
  def selectGroup(groups: Vector[Group], agent: String): Group = {
    val tok = if (agent == null) "" else agent.toLowerCase
    val exact = groups.filter(_.agents.contains(tok))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    Group(Vector(tok),
      chosen.flatMap(_.rules),
      chosen.flatMap(_.crawlDelay).headOption)
  }

  /** `*`/`$` pattern match against a path (prefix semantics: the pattern
    * must match starting at position 0; without `$` it may end anywhere).
    * Iterative greedy-with-backtrack — no regex compilation per row. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // match pat as a prefix-pattern of path
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi == pat.length && !anchored) return true // prefix hit: pattern exhausted mid-path
      if (pi < pat.length && pat.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi } // backtrack: '*' eats one more
      else return false
    }
    // path exhausted: remaining pattern must be all '*'
    var k = pi
    while (k < pat.length) { if (pat.charAt(k) != '*') return false; k += 1 }
    true
  }

  /** Longest-match decision: most-specific (longest-pattern) matching rule
    * wins; Allow beats Disallow at equal length; no match = allowed. */
  def isAllowed(rules: Vector[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules) {
      if (r.pattern.length > bestLen || (r.pattern.length == bestLen && r.allow && !bestAllow)) {
        if (patternMatches(r.pattern, path)) {
          bestLen = r.pattern.length
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  // ---------------------------------------------------------------- fixture

  /** Deterministic robots.txt for `site{h}.example.com` (FIXTURES.md family).
    * Exercises agent-specific groups, longest-match Allow-under-Disallow,
    * `*` group fallback, comments, and Crawl-delay:
    * {{{
    *   User-agent: graftbot         — Disallow /private/;
    *                                  h%2==0 also Allow /private/pub/
    *   User-agent: *                — Disallow /tmp/;
    *                                  h%3==0 also Disallow /nav/;
    *                                  Crawl-delay 1 + h%4
    * }}}
    */
  def robotsTxt(hostId: Int): String = {
    val sb = new StringBuilder(256)
    sb.append("# robots.txt for site").append(hostId).append(".example.com\n")
    sb.append("User-agent: GraftBot\n")
    sb.append("Disallow: /private/\n")
    if (hostId % 2 == 0) sb.append("Allow: /private/pub/\n")
    sb.append("\nUser-agent: *\n")
    sb.append("Disallow: /tmp/\n")
    if (hostId % 3 == 0) sb.append("Disallow: /nav/\n")
    sb.append("Crawl-delay: ").append(1 + hostId % 4).append('\n')
    sb.toString
  }

  /** Deterministic crawl-frontier urls over `documents` (host = doc_id%7 as
    * in the host-rank family; path class = doc_id%5 hits every rule):
    * 0 `/private/doc{id}`, 1 `/private/pub/doc{id}`, 2 `/tmp/doc{id}`,
    * 3 `/nav/doc{id}`, 4 `/articles/doc{id}.html`. */
  def plantFrontier(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit("site"), col("doc_id") % 7, lit(".example.com")).as("host"),
      concat(
        when(col("doc_id") % 5 === 0, lit("/private/doc"))
          .when(col("doc_id") % 5 === 1, lit("/private/pub/doc"))
          .when(col("doc_id") % 5 === 2, lit("/tmp/doc"))
          .when(col("doc_id") % 5 === 3, lit("/nav/doc"))
          .otherwise(lit("/articles/doc")),
        col("doc_id"),
        when(col("doc_id") % 5 === 4, lit(".html")).otherwise(lit(""))).as("path"))

  /** Host-grain robots table for the fixture's 7 hosts. */
  def robotsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 7).map(h => (s"site$h.example.com", robotsTxt(h))).toDF("host", "robots_txt")
  }

  // ------------------------------------------------------------ spark surface

  /** Per-url fetch-policy decisions for the given agents: joins host-grain
    * robots bodies onto the frontier (small side broadcast-or-shuffled by
    * the optimizer), then evaluates map-side with a per-partition
    * parse-once-per-host cache. Output columns:
    * `doc_id, host, path, allowed_<agent>..., crawl_delay` (delay from the
    * LAST agent's group — the generic fetcher's politeness knob). */
  def decisions(frontier: DataFrame, robots: DataFrame, agents: Seq[String]): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val joined = frontier.join(robots, Seq("host"), "left")
      .select(col("doc_id"), col("host"), col("path"), col("robots_txt"))
      .as[(Long, String, String, String)]
    val agentsV = agents.toVector
    val out = joined.mapPartitions { it =>
      // parse cache: one parse per distinct (host, agent) per partition
      val cache = new java.util.HashMap[String, Vector[(Vector[Rule], Option[Long])]]()
      it.map { case (docId, host, path, robotsTxt) =>
        var parsed = cache.get(host)
        if (parsed == null) {
          val groups = parseGroups(robotsTxt)
          parsed = agentsV.map { a =>
            val g = selectGroup(groups, a)
            (g.rules, g.crawlDelay)
          }
          cache.put(host, parsed)
        }
        val allowed = parsed.map { case (rules, _) => isAllowed(rules, path) }
        (docId, host, path, allowed, parsed.last._2.getOrElse(0L))
      }
    }
    val base = out.toDF("doc_id", "host", "path", "allowed", "crawl_delay")
    val widened = agentsV.zipWithIndex.foldLeft(base) { case (df, (a, i)) =>
      df.withColumn(s"allowed_${a.toLowerCase}", col("allowed")(i))
    }.drop("allowed")
    val outCols = Seq(col("doc_id"), col("host"), col("path")) ++
      agentsV.map(a => col(s"allowed_${a.toLowerCase}")) :+ col("crawl_delay")
    widened.select(outCols: _*)
  }

  /** Politeness-scheduled fetch plan over the admitted frontier: per host,
    * urls are sequenced deterministically (by path) and spaced by the host's
    * crawl-delay — `start_sec = (fetch_seq - 1) * crawl_delay`. The window
    * is HOST-partitioned: one shuffle by host (the same key the fetcher
    * shards on anyway), no global sort, per-host state streams through the
    * window operator. Composes [[decisions]]: only `allowedCol` rows fetch. */
  def schedule(decided: DataFrame, allowedCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host").orderBy("path")
    decided.filter(col(allowedCol))
      .withColumn("fetch_seq", row_number().over(w).cast("long"))
      .withColumn("start_sec", (col("fetch_seq") - 1L) * col("crawl_delay"))
      .select("doc_id", "host", "path", "fetch_seq", "start_sec")
  }
}
