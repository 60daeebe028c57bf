package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.webtext.{HtmlDom, HtmlGen, MainContent}
import graft.webtext.HtmlDom.{HElem, HText}

class HtmlDomSpec extends AnyFunSuite {

  test("entities decode in text and attributes; unknown '&' stays literal") {
    assert(HtmlDom.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ==
      "a & b <c> \"d\" 'e'")
    assert(HtmlDom.decodeEntities("&#65;&#x42;") == "AB")
    assert(HtmlDom.decodeEntities("fish & chips &nope; &") == "fish & chips &nope; &")
    val root = HtmlDom.parse("""<a title="x &amp; y">t &lt;u&gt;</a>""")
    val a = HtmlDom.find(root, _.tag == "a").head
    assert(a.attr("title").contains("x & y"))
    assert(HtmlDom.textOf(a) == "t <u>")
  }

  test("script and style are raw text: '<' '&' and fake tags inside are dropped") {
    val html = """<body><script>if(1<2&&x){"<p>no</p>"}</script><style>a<b{}</style><p>yes</p></body>"""
    val root = HtmlDom.parse(html)
    assert(HtmlDom.textOf(root) == "yes")
    assert(HtmlDom.find(root, _.tag == "p").size == 1)
  }

  test("void elements never swallow siblings; self-closing works") {
    val root = HtmlDom.parse("<p>a<br>b<img src='x'>c<span/>d</p>")
    assert(HtmlDom.textOf(root) == "abcd")
    val p = HtmlDom.find(root, _.tag == "p").head
    assert(p.children.count(_.isInstanceOf[HElem]) == 3)
  }

  test("mismatched close tags recover to the nearest open tag; stray closes ignored") {
    val root = HtmlDom.parse("<div><b>x</i>y</b></div></nav><p>z</p>")
    assert(HtmlDom.textOf(root) == "xyz")
    assert(HtmlDom.find(root, _.tag == "p").size == 1)
  }

  test("tag soup: trailing '<' and lone '<' terminate (no infinite loop), kept as text") {
    // a payload ending in '<' used to loop forever appending empty text nodes
    val root = HtmlDom.parse("<p>ab</p><")
    assert(HtmlDom.textOf(root) == "ab<")
    assert(HtmlDom.textOf(HtmlDom.parse("<")) == "<")
    assert(HtmlDom.textOf(HtmlDom.parse("x<")) == "x<")
    assert(HtmlDom.textOf(HtmlDom.parse("a < b <. c")) == "a < b <. c")
    assert(HtmlDom.textOf(HtmlDom.parse("<div>unclosed<")) == "unclosed<")
  }

  test("tag soup: stray '=' in a tag does not swallow the closing '>'") {
    val root = HtmlDom.parse("<div =x>hello<p>world</p></div>")
    assert(HtmlDom.textOf(root) == "helloworld")
    assert(HtmlDom.find(root, _.tag == "p").size == 1)
  }

  test("close tags with attributes still close; longer names don't end raw text") {
    val root = HtmlDom.parse("""<div class="s">a</div class="s"><p>b</p>""")
    assert(HtmlDom.find(root, _.tag == "div").head.children ==
      Vector(HtmlDom.HText("a")))
    val raw = HtmlDom.parse("""<script>x("</scripts>")</script><p>ok</p>""")
    assert(HtmlDom.textOf(raw) == "ok")
  }

  test("processing instructions are dropped like comments") {
    val root = HtmlDom.parse("""<?xml version="1.0"?><p>a <?php echo 1; ?>b</p>""")
    assert(HtmlDom.textOf(root) == "a b")
  }

  test("pathological nesting is depth-capped: no stack overflow in the walkers") {
    val soup = "<div>" * 200000 + "deep"
    val root = HtmlDom.parse(soup)
    assert(HtmlDom.textOf(root) == "deep")
    assert(MainContent.extract(soup + "</div>") != null)
  }

  test("comments and doctype are skipped") {
    val root = HtmlDom.parse("<!DOCTYPE html><!-- <p>not here</p> --><p>here</p>")
    assert(HtmlDom.textOf(root) == "here")
  }

  test("attributes: bare, single, double quotes; class set parsing") {
    val root = HtmlDom.parse("""<div class="a  b" id=main data-x='1'>t</div>""")
    val d = HtmlDom.find(root, _.tag == "div").head
    assert(d.classes == Set("a", "b"))
    assert(d.attr("id").contains("main"))
    assert(d.attr("data-x").contains("1"))
  }
}

class MainContentSpec extends AnyFunSuite {

  private def words(n: Int): String = (1 to n).map("word" + _).mkString(" ")

  test("generated pages extract byte-identical main text across sizes and layout variants") {
    for (docId <- 0L until 24L; n <- Seq(10, 24, 25, 48, 73, 100)) {
      val text = words(n)
      val got = MainContent.extract(HtmlGen.page(docId, text))
      assert(got == HtmlGen.expectedMainText(text), s"docId=$docId n=$n")
    }
  }

  test("expected main text is the 24-word paragraph rechunk") {
    val text = words(50)
    val paras = HtmlGen.expectedMainText(text).split("\n", -1)
    assert(paras.length == 3)
    assert(paras(0).split(" ", -1).length == 24)
    assert(paras(2).split(" ", -1).length == 2)
    assert(paras.mkString(" ") == text)
  }

  test("link-density penalty rejects a link-heavy block with more raw text than the article") {
    // nav-like block with MORE total text than the article, but almost all of
    // it inside anchors and none in paragraphs
    val html =
      """<body>
        |<div class="huge-nav">
        |  <p><a href="/1">alpha beta gamma delta epsilon zeta eta theta iota kappa</a></p>
        |  <p><a href="/2">lambda mu nu xi omicron pi rho sigma tau upsilon</a></p>
        |  <p><a href="/3">phi chi psi omega alef bet gimel dalet he vav</a></p>
        |</div>
        |<article><p>short real content lives here</p></article>
        |</body>""".stripMargin
    assert(MainContent.extract(html) == "short real content lives here")
  }

  test("block stats match the generator arithmetic") {
    for (docId <- 0L until 12L) {
      val text = words(73) // P = 4 paragraphs
      val s = MainContent.stats(HtmlGen.page(docId, text))
      val p = 4L
      assert(s.n_anchors == 4 + docId % 4 + 3 + docId % 3 + 2 + p / 3, s"docId=$docId")
      assert(s.n_paragraphs == p + 2)
      assert(s.n_comment_divs == 2 + docId % 2)
      assert(s.main_paragraphs == p)
      assert(s.main_chars == text.length - (p - 1))
    }
  }

  test("article outscores body with a real margin on the smallest documents") {
    val text = words(10) // smallest corpus shape
    val root = HtmlDom.parse(HtmlGen.page(3L, text))
    val blocks = MainContent.blocks(root)
    val byTag = blocks.groupBy(_.tag)
    val article = byTag("article").head.score
    val body = byTag("body").head.score
    assert(article > body * 1.1, s"article=$article body=$body")
  }

  test("content-less page degrades to the best boilerplate block, not a crash") {
    // with an empty article every block scores on boilerplate alone; the body
    // shell is excluded while some inner block still carries paragraph mass,
    // so the winner is the best inner boilerplate block (the sidebar promo).
    // The corpus has no empty documents (min 44 chars), so the byte-identity
    // oracle never exercises this branch.
    val got = MainContent.extract(HtmlGen.page(7L, ""))
    assert(got.nonEmpty && !got.contains("example corp"))
  }

  test("tiny articles still beat the body shell (body excluded while inner mass exists)") {
    // below ~10 words the body's aggregate paragraph mass (sidebar promo +
    // footer copyright) could outscore a tiny article; body is only eligible
    // when no inner candidate has paragraph mass, so the article wins from
    // 2 words (~5 chars) up — the floor is now the link-damped sidebar promo
    // (score ~1.9), not the body shell (score ~15)
    for (nw <- Seq(2, 3, 5, 9); docId <- 0L to 3L) {
      val text = (1 to nw).map(i => s"w$i").mkString(" ")
      assert(MainContent.extract(HtmlGen.page(docId, text)) == HtmlGen.expectedMainText(text),
        s"docId=$docId words=$nw")
    }
  }

  test("article text directly under body (no wrapper) falls back to body") {
    val html = "<html><body><nav><a href='/x'>somewhere else</a></nav>" +
      "<p>bare article paragraph</p></body></html>"
    assert(MainContent.extract(html) == "bare article paragraph")
  }

  test("links: pre-order inventory, anchor text, and main-block membership match the generator") {
    // independent recompute of HtmlGen's documented arithmetic (nav 4+id%4
    // labeled at (id+k)%11, sidebar 3+id%3 at (id+2k)%6, inline at p%3==2
    // wrapping the paragraph's last word, footer about/terms)
    val nav = Array("homepage", "politics", "business", "sciences", "cultures",
      "archives", "weathers", "sportive", "contacts", "newsfeed", "features")
    val side = Array("trending now", "most shared", "editor desk", "latest wire",
      "top stories", "deep dives")
    for (docId <- 0L until 12L; n <- Seq(2, 10, 24, 73, 100)) {
      val text = words(n)
      val ws = text.split(" ", -1)
      val p = (ws.length + 23) / 24
      val exp = Vector.newBuilder[(String, String, Boolean)]
      for (k <- 0 until (4 + docId % 4).toInt)
        exp += (("/nav/" + k, nav(((docId + k) % 11).toInt), false))
      for (k <- 0 until (3 + docId % 3).toInt)
        exp += (("/rel/" + k, side(((docId + 2 * k) % 6).toInt), false))
      for (pi <- 0 until p if pi % 3 == 2)
        exp += ((s"/w/$docId/$pi", ws(math.min(24 * (pi + 1), ws.length) - 1), true))
      exp += (("/about", "about us!", false))
      exp += (("/terms", "terms!!!", false))
      val got = MainContent.links(HtmlGen.page(docId, text)).map(l => (l.href, l.text, l.inMain))
      assert(got == exp.result(), s"docId=$docId n=$n")
    }
  }
}

class WebTextSparkSpec extends AnyFunSuite {
  import SparkSuite._

  test("html_main_content equals the 24-word rechunk for every document at sf0.001") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("html_main_content")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) =>
      assert(got(s"doc://$id") == HtmlGen.expectedMainText(text), s"doc $id")
    }
  }

  test("html extraction is invariant under partition count (determinism half of scaling)") {
    val a = SparkEntry.queries("html_main_content")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val b = graft.webtext.WebText.mainContent(
      graft.webtext.WebText.htmlPages(
        spark.read.parquet(s"$sf/documents.parquet").repartition(7)).toDF(),
      saltPartitions = 3).toDF()
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(a.sameElements(b))
  }

  test("html_links is partition-invariant and marks exactly the inline anchors as main") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getBoolean(5))).sorted
    val a = rows(SparkEntry.queries("html_links")(spark, sf))
    val b = rows(graft.webtext.WebText.pageLinks(
      graft.webtext.WebText.htmlPages(
        spark.read.parquet(s"$sf/documents.parquet").repartition(7)).toDF(),
      saltPartitions = 3).toDF())
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.forall { case (url, _, href, resolved, _, main) =>
      main == href.startsWith("/w/") && resolved == url + href
    })
  }
}

class UrlOpsSpec extends AnyFunSuite {
  import graft.webtext.UrlOps.{normalize, hostOf}

  test("normalize: case, www, default ports, fragments, tracking params") {
    assert(normalize("HTTP://WWW.Example.COM:80/Path/A?utm_source=x&q=1#frag") ==
      "http://example.com/Path/A?q=1")
    assert(normalize("https://www.site.org:443/") == "https://site.org/")
    // non-default port kept; path case kept; param order preserved
    assert(normalize("https://Site.org:8443/P?b=2&utm_campaign=c&a=1") ==
      "https://site.org:8443/P?b=2&a=1")
    // all params tracking -> '?' dropped entirely
    assert(normalize("http://a.com/x?utm_medium=z") == "http://a.com/x")
    assert(normalize("http://a.com/x?gclid=123") == "http://a.com/x")
    // bare authority, query without path, fragment only
    assert(normalize("http://A.com?q=1") == "http://a.com?q=1")
    assert(normalize("http://A.com#f") == "http://a.com")
    // utm must match the NAME prefix, not a value or substring
    assert(normalize("http://a.com/x?q=utm_source&myutm_x=1") ==
      "http://a.com/x?q=utm_source&myutm_x=1")
  }

  test("normalize + hostOf handle IPv6 literals, userinfo, and bare '?'") {
    // IPv6: the bracket literal is the host; port colon only counts after ']'
    assert(normalize("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(normalize("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
    assert(hostOf("http://[2001:db8::1]:8080/x") == "[2001:db8::1]")
    assert(hostOf("http://[2001:db8::1]/x") == "[2001:db8::1]")
    // userinfo: preserved verbatim (case-sensitive), folding acts on the host
    assert(normalize("http://User:Pw@WWW.Example.COM:80/x") == "http://User:Pw@example.com/x")
    assert(hostOf("http://User:Pw@example.com/x") == "example.com")
    // a query emptied by filtering (or bare '?') loses its '?'
    assert(normalize("http://a.com/x?") == "http://a.com/x")
    assert(normalize("http://a.com/x?&") == "http://a.com/x")
  }

  test("resolve: absolute, scheme-prefixed, protocol-relative, rooted, query/fragment, relative") {
    import graft.webtext.UrlOps.resolve
    assert(resolve("doc://123", "/nav/0") == "doc://123/nav/0")
    assert(resolve("https://a.com/x/y?q=1#f", "/p") == "https://a.com/p")
    assert(resolve("https://a.com/x/y", "z") == "https://a.com/x/z")
    assert(resolve("https://a.com", "z") == "https://a.com/z")
    assert(resolve("https://a.com/x/y?q=1", "?r=2") == "https://a.com/x/y?r=2")
    assert(resolve("https://a.com/x/y?q=1#f", "#g") == "https://a.com/x/y?q=1#g")
    assert(resolve("https://a.com/x", "//b.com:443/z") == "https://b.com:443/z")
    assert(resolve("https://a.com/x", "http://b.com/z") == "http://b.com/z")
    assert(resolve("https://a.com/x", "mailto:u@b.c") == "mailto:u@b.c")
    assert(resolve("https://a.com/x", "tel:+1-555") == "tel:+1-555")
    // total: null/empty/garbage degrade, never throw
    assert(resolve("https://a.com/x", "") == "https://a.com/x")
    assert(resolve("https://a.com/x", null) == "https://a.com/x")
    assert(resolve(null, "/p") == "/p")
    assert(resolve("not a url", "/p") == "/p")
    assert(resolve("https://a.com/dir/page", "img/1.png") == "https://a.com/dir/img/1.png")
    // RFC 3986 schemes are ASCII-only: a non-ASCII first segment with ':'
    // is a relative path, not a scheme
    assert(resolve("https://a.com/dir/page", "café:menu") == "https://a.com/dir/café:menu")
  }

  test("normalize is total: schemeless/garbage/null pass through, never throw") {
    assert(normalize("doc://123") == "doc://123") // non-http scheme: port/www rules no-op
    assert(normalize("not a url") == "not a url")
    assert(normalize("") == "")
    assert(normalize(null) == null)
    assert(normalize("://weird") == "://weird")
  }

  test("normalize is idempotent and total over deterministic url-soup fuzz") {
    // idempotence lets an already-canonical table be re-canonicalized freely
    // (repeated www. labels were the one violation; now stripped to fixpoint)
    assert(normalize("http://www.www.example.com/x") == "http://example.com/x")
    assert(normalize("http://www./x") == "http://www./x") // never empty the host
    // a port must not defeat the never-empty-host guard, including via the
    // subsequent default-port strip
    assert(normalize("http://www.:8080/x") == "http://www.:8080/x")
    assert(normalize("http://www.:80/x") == "http://www./x")
    val schemes = Seq("http://", "HTTPS://", "", "ftp://", "://")
    val hosts = Seq("www.A.com", "www.www.b.org", "[::1]", "u:p@WWW.c.net", "", "x", "www.")
    val ports = Seq("", ":80", ":443", ":8080", ":")
    val tails = Seq("", "/P?utm_source=1", "/p?a=1&utm_x=2#f", "?", "#f", "/?&", "??a")
    for (s <- schemes; h <- hosts; p <- ports; t <- tails) {
      val u = s + h + p + t
      val n1 = normalize(u) // must not throw
      assert(normalize(n1) == n1, s"not idempotent: '$u' -> '$n1' -> '${normalize(n1)}'")
      // canonicalization never turns a nonempty host into an empty one
      if (hostOf(u).nonEmpty)
        assert(hostOf(n1).nonEmpty, s"host emptied: '$u' -> '$n1'")
    }
  }

  test("hostOf on normalized urls") {
    assert(hostOf("http://example.com/Path") == "example.com")
    assert(hostOf("https://site.org:8443/x") == "site.org")
    assert(hostOf("no scheme") == "")
  }
}

class HostRankSpec extends AnyFunSuite {
  import SparkSuite._
  import org.apache.spark.sql.functions._
  import graft.webtext.HostRank

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hostRank matches a driver-side integer recompute on the sf0.001 graph") {
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    // pure-Scala recompute of the exact arithmetic contract
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for (i <- ids) {
      w((i % 7, (2 * i + 1) % 7)) += 1
      if (i % 3 == 0) w((i % 7, (3 * i + 2) % 7)) += 1
      if (i % 5 < 2) w((i % 7, 0L)) += 1
    }
    val outw = w.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
    val n = 7L; val scale = 1000000L; val damp = 8500L
    val teleport = ((10000L - damp) * scale / 10000L) / n
    var r = (0L until 7L).map(h => h -> scale / n).toMap
    for (_ <- 1 to 3) {
      val c = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (((s0, d), wt) <- w) c(d) += r(s0) * wt * damp / (outw(s0) * 10000L)
      r = (0L until 7L).map(h => h -> (teleport + c(h))).toMap
    }
    val expected = r.map { case (h, v) => (s"site$h.example.com", v) }.toSeq.sorted

    val got = HostRank.rank(HostRank.hostEdges(docs)).orderBy("host")
      .collect().map(row => (row.getString(0), row.getLong(1))).toSeq
    assert(got == expected)
    // the hub edge class must actually differentiate ranks
    assert(got.head._2 > 2 * got.last._2, s"no skew: $got")
  }

  test("hostRank conserves mass within truncation loss and respects damping bounds") {
    val ranks = HostRank.rank(HostRank.hostEdges(docs))
    val total = ranks.agg(sum("rank")).collect()(0).getLong(0)
    // each of 3 iterations truncates at most (edges + 2) units of mass per
    // division plus the teleport floor; at this scale loss stays tiny
    assert(total > 900000L && total <= 1000000L, s"mass: $total")
    val minR = ranks.agg(min("rank")).collect()(0).getLong(0)
    assert(minR >= ((10000L - 8500L) * 1000000L / 10000L) / 7L) // >= teleport
  }

  test("20-iteration rank plans in constant depth (lineage truncated) and matches the recompute") {
    // VERDICT r4 item 6: without per-3-round localCheckpoint, 20 iterations
    // re-plan an exponentially nested DAG. The truncation replaces checkpointed
    // subtrees with LogicalRDD scans at PLAN time, so the final plan string
    // stays small and contains an ExistingRDD scan.
    val ranks20 = HostRank.rank(HostRank.hostEdges(docs), iters = 20)
    val plan = ranks20.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"expected checkpoint-truncated lineage in:\n$plan")
    assert(plan.length < 100000, s"plan blew up to ${plan.length} chars")
    // and it actually runs: mass conservation bound still holds after 20 rounds
    val total = ranks20.agg(sum("rank")).collect()(0).getLong(0)
    assert(total > 900000L && total <= 1000000L, s"mass: $total")
  }

  test("rankConverged reaches the exact trunc-division fixed point of the iterated update") {
    // independent recompute of the fixed point (iterate until stable)
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for (i <- ids) {
      w((i % 7, (2 * i + 1) % 7)) += 1
      if (i % 3 == 0) w((i % 7, (3 * i + 2) % 7)) += 1
      if (i % 5 < 2) w((i % 7, 0L)) += 1
    }
    val outw = w.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
    val n = 7L; val scale = 1000000L; val damp = 8500L
    val teleport = ((10000L - damp) * scale / 10000L) / n
    var r = (0L until 7L).map(h => h -> scale / n).toMap
    var rounds = 0
    var stable = false
    while (!stable && rounds < 50) {
      val c = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (((s0, d), wt) <- w) c(d) += r(s0) * wt * damp / (outw(s0) * 10000L)
      val next = (0L until 7L).map(h => h -> (teleport + c(h))).toMap
      stable = next == r
      r = next
      rounds += 1
    }
    assert(stable, "recompute did not converge within 50 rounds")
    val expected = r.map { case (h, v) => (s"site$h.example.com", v) }.toSeq.sorted
    val got = HostRank.rankConverged(HostRank.hostEdges(docs)).orderBy("host")
      .collect().map(row => (row.getString(0), row.getLong(1))).toSeq
    assert(got == expected, s"rounds=$rounds")
    // the fixed point must be invariant under one more engine iteration:
    // running the 3-round fixed-iter rank FROM a converged start would be the
    // identity — checked here by equality to the 40-round unrolled oracle
    // contract (any M >= convergence matches), via one extra driver round
    val c = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (((s0, d), wt) <- w) c(d) += r(s0) * wt * damp / (outw(s0) * 10000L)
    assert((0L until 7L).forall(h => teleport + c(h) == r(h)), "not a true fixed point")
  }

  test("crawlBudget floor-splits the global budget proportionally to rank") {
    val ranks = HostRank.rank(HostRank.hostEdges(docs))
    val rows = HostRank.crawlBudget(ranks).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val s = rows.map(_._2).sum
    for ((h, rank, budget) <- rows)
      assert(budget == rank * 1000000L / s, s"host $h")
    // floor split: total within (n-1) of the budget, never over
    val tot = rows.map(_._3).sum
    assert(tot <= 1000000L && tot > 1000000L - rows.length, s"total: $tot")
  }
}

class HitsSpec extends AnyFunSuite {
  import SparkSuite._
  import org.apache.spark.sql.functions._
  import graft.webtext.{Hits, HostRank}

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def edgeWeights: Map[(Long, Long), Long] = {
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for (i <- ids) {
      w((i % 7, (2 * i + 1) % 7)) += 1
      if (i % 3 == 0) w((i % 7, (3 * i + 2) % 7)) += 1
      if (i % 5 < 2) w((i % 7, 0L)) += 1
    }
    w.toMap
  }

  test("hubsAuths matches a driver-side integer recompute on the sf0.001 graph") {
    val w = edgeWeights
    val scale = 1000000L
    var hub = (0L until 7L).map(h => h -> scale).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      val ar = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (((s0, d), wt) <- w) ar(d) += hub(s0) * wt
      val amx = ar.values.max
      auth = (0L until 7L).map(h => h -> (if (ar.contains(h)) ar(h) * scale / amx else 0L)).toMap
      val hr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (((s0, d), wt) <- w) hr(s0) += auth(d) * wt
      val hmx = hr.values.max
      hub = (0L until 7L).map(h => h -> (if (hr.contains(h)) hr(h) * scale / hmx else 0L)).toMap
    }
    val expected = (0L until 7L)
      .map(h => (s"site$h.example.com", hub(h), auth(h))).sortBy(_._1)

    val got = Hits.hubsAuths(HostRank.hostEdges(docs)).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // max-norm contract: some host pins each score family at exactly scale
    assert(got.map(_._2).max == 1000000L && got.map(_._3).max == 1000000L)
    // the hub-edge plant makes site0 the top authority (every id%5<2 doc
    // endorses it) — HITS must separate it from its merely-average hub score
    val site0 = got.find(_._1 == "site0.example.com").get
    assert(site0._3 == 1000000L, s"site0 should be the max authority: $got")
  }

  test("hubsAuths zeroes the missing side: a pure-sink node gets hub 0, a pure-source auth 0") {
    import spark.implicits._
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("c", "b", 2L))
      .toDF("src", "dst", "weight")
    val got = Hits.hubsAuths(edges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got.find(_._1 == "b").get._2 == 0L, s"sink b must have hub 0: $got")
    assert(got.find(_._1 == "a").get._3 == 0L, s"source a must have auth 0: $got")
    // a is the only hub feeding the max authority path at weight 3
    assert(got.find(_._1 == "a").get._2 == 1000000L, s"a is the top hub: $got")
    assert(got.forall(r => r._2 <= 1000000L && r._3 <= 1000000L))
  }

  test("20-round hubsAuths plans in constant depth (lineage truncated every round)") {
    val ha20 = Hits.hubsAuths(HostRank.hostEdges(docs), iters = 20)
    val plan = ha20.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"expected checkpoint-truncated lineage in:\n$plan")
    assert(plan.length < 200000, s"plan blew up to ${plan.length} chars")
    val mx = ha20.agg(max("hub"), max("auth")).collect()(0)
    assert(mx.getLong(0) == 1000000L && mx.getLong(1) == 1000000L)
  }
}

class TrianglesSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{HostRank, Triangles}

  test("hostTriangles matches a driver-side adjacency recompute on the sf0.001 graph") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    for (i <- ids) {
      val es = Seq((i % 7, (2 * i + 1) % 7)) ++
        (if (i % 3 == 0) Seq((i % 7, (3 * i + 2) % 7)) else Nil) ++
        (if (i % 5 < 2) Seq((i % 7, 0L)) else Nil)
      es.foreach { case (s, d) => if (s != d) und += ((math.min(s, d), math.max(s, d))) }
    }
    val adj = (0L until 7L).map(h =>
      h -> und.collect { case (a, b) if a == h => b; case (a, b) if b == h => a }.toSet).toMap
    val triC = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (a <- 0L until 7L; b <- adj(a) if b > a; c <- adj(a) intersect adj(b) if c > b) {
      triC(a) += 1; triC(b) += 1; triC(c) += 1
    }
    val expected = (0L until 7L).filter(adj(_).nonEmpty).map { h =>
      val d = adj(h).size.toLong
      val t = triC(h)
      (s"site$h.example.com", d, t, if (d < 2) 0L else t * 20000L / (d * (d - 1)))
    }.sortBy(_._1)

    val got = Triangles.hostTriangles(HostRank.hostEdges(docs)).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("triangle ground truths: K3 counts one per host at cc 10000, a path has none") {
    import spark.implicits._
    val k3 = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)).toDF("src", "dst", "weight")
    val gotK3 = Triangles.hostTriangles(k3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(gotK3 == Seq(("a", 2L, 1L, 10000L), ("b", 2L, 1L, 10000L), ("c", 2L, 1L, 10000L)))
    val path = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L)).toDF("src", "dst", "weight")
    assert(Triangles.hostTriangles(path).collect().forall(_.getLong(2) == 0L))
    // reverse-duplicate directed edges collapse to one undirected edge
    val dup = Seq(("a", "b", 1L), ("b", "a", 9L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "weight")
    assert(Triangles.hostTriangles(dup).collect().map(_.getLong(2)).sum == 3L)
  }

  test("triangle plan: equi-joins only, no cartesian in wedge or closure stages") {
    val q = Triangles.hostTriangles(
      HostRank.hostEdges(spark.read.parquet(s"$sf/documents.parquet")))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge/closure must stay keyed:\n$plan")
  }
}

class KCoreSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{HostRank, KCore}

  test("kcoreHosts matches a driver-side peel recompute on the sf0.001 graph") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    for (i <- ids) {
      val es = Seq((i % 7, (2 * i + 1) % 7)) ++
        (if (i % 3 == 0) Seq((i % 7, (3 * i + 2) % 7)) else Nil) ++
        (if (i % 5 < 2) Seq((i % 7, 0L)) else Nil)
      es.foreach { case (s, d) => if (s != d) und += ((math.min(s, d), math.max(s, d))) }
    }
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSet
    var cur = nodes
    var stable = false
    while (!stable) {
      val deg = cur.map(h => h -> und.count { case (a, b) =>
        (a == h && cur(b)) || (b == h && cur(a)) }).toMap
      val next = cur.filter(deg(_) >= 3)
      stable = next == cur
      cur = next
    }
    val expected = nodes.toSeq.sorted.map { h =>
      val cd = if (cur(h)) und.count { case (a, b) =>
        (a == h && cur(b)) || (b == h && cur(a)) }.toLong else 0L
      (s"site$h.example.com", if (cur(h)) 1L else 0L, cd)
    }
    val got = KCore.kcoreHosts(HostRank.hostEdges(docs)).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.exists(_._2 == 0L) && got.exists(_._2 == 1L), "peel must be non-trivial")
  }

  test("kcore peels cascading chains: a path fully dissolves at k=2, K4 survives k=3") {
    import spark.implicits._
    // path a-b-c-d-e at k=2: endpoints peel, then b/d, then c — 3 rounds
    val path = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L), ("d", "e", 1L))
      .toDF("src", "dst", "weight")
    val gp = KCore.kcoreHosts(path, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(gp.length == 5 && gp.forall(r => r._2 == 0L && r._3 == 0L))
    // K4 + pendant f: pendant peels, the clique survives at full degree
    val k4p = Seq(("a", "b", 1L), ("a", "c", 1L), ("a", "d", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L), ("d", "f", 1L)).toDF("src", "dst", "weight")
    val gk = KCore.kcoreHosts(k4p, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(gk == Seq(("a", 1L, 3L), ("b", 1L, 3L), ("c", 1L, 3L), ("d", 1L, 3L), ("f", 0L, 0L)))
  }
}

class CociteSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{Cocite, HostRank}

  test("cocitationPairs matches a driver-side citing-set recompute on the sf0.001 graph") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val citers = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for (i <- ids) {
      val es = Seq((i % 7, (2 * i + 1) % 7)) ++
        (if (i % 3 == 0) Seq((i % 7, (3 * i + 2) % 7)) else Nil) ++
        (if (i % 5 < 2) Seq((i % 7, 0L)) else Nil)
      es.foreach { case (s, d) => if (s != d) citers(d) = citers(d) + s }
    }
    val hs = citers.keys.toSeq.sorted
    val expected = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      co = (citers(hs(i)) intersect citers(hs(j))).size.toLong if co > 0
      un = (citers(hs(i)).size + citers(hs(j)).size).toLong - co
    } yield (s"site${hs(i)}.example.com", s"site${hs(j)}.example.com", co, co * 10000L / un))
      .sortBy(p => (p._1, p._2))
    val got = Cocite.cocitationPairs(HostRank.hostEdges(docs)).orderBy("h1", "h2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("cocitation ground truths: shared citers count once, jaccard exact") {
    import spark.implicits._
    // c,d cited by {a,b}; e cited by {a}; duplicate directed edge collapses
    val e = Seq(("a", "c", 1L), ("a", "c", 9L), ("b", "c", 1L), ("a", "d", 1L),
      ("b", "d", 1L), ("a", "e", 1L)).toDF("src", "dst", "weight")
    val got = Cocite.cocitationPairs(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(p => (p._1, p._2)).toSeq
    assert(got == Seq(("c", "d", 2L, 10000L), ("c", "e", 1L, 5000L), ("d", "e", 1L, 5000L)))
  }
}

class RecrawlSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.Recrawl

  test("delta classifies added/removed/changed/unchanged per the snapshot recipe") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Recrawl.delta(docs, Recrawl.snapshotB(docs)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    for (i <- ids) {
      val expect =
        if (i % 7 == 3) "removed"
        else if (i % 5 == 1) "changed"
        else "unchanged"
      assert(got(i) == expect, s"doc $i")
      if (i % 11 == 0) assert(got(i + 1000000L) == "added", s"new doc from $i")
    }
    assert(got.size == ids.size + ids.count(_ % 11 == 0))
    // every class must occur at this sf
    assert(got.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("delta is symmetric-safe: identical snapshots are all unchanged") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val st = Recrawl.delta(docs, docs).select("status").distinct().collect().map(_.getString(0))
    assert(st.toSeq == Seq("unchanged"))
  }
}

class AnchorTextAggSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.WebText

  test("anchorTextAgg matches a driver-side recompute and honors the citation floor") {
    val links = WebText.pageLinks(
      WebText.htmlPages(spark.read.parquet(s"$sf/documents.parquet")).toDF()).toDF()
    val raw = links.select("href", "anchor_text", "url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val docsPer = raw.groupBy(_._1).map { case (h, xs) => h -> xs.map(_._3).distinct.size }
    val agg = raw.filter(x => docsPer(x._1) >= 2)
      .flatMap { case (h, a, _) => a.split(" ", -1).map(h -> _) }
      .groupBy(identity).map { case ((h, t), xs) => (h, t, xs.size.toLong) }
    val expected = agg.groupBy(_._1).toSeq.flatMap { case (h, xs) =>
      xs.toSeq.sortBy { case (_, t, c) => (-c, t) }.take(3).zipWithIndex
        .map { case ((_, t, c), r0) => (h, t, (r0 + 1).toLong, c) }
    }.sorted

    val got = WebText.anchorTextAgg(links).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(got == expected)
    // per-page-unique inline targets are excluded by the floor
    assert(!got.exists(_._1.startsWith("/w/")))
    assert(got.nonEmpty)
  }
}

class RobotsSpec extends AnyFunSuite {
  import SparkSuite._
  import org.apache.spark.sql.functions._
  import graft.webtext.Robots
  import graft.webtext.Robots.{Rule, Group}

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("parser: groups, comments, case-insensitivity, empty Disallow, unknown directives") {
    val txt =
      """# top comment
        |User-Agent: AlphaBot   # trailing comment
        |user-agent: BetaBot
        |DISALLOW: /a/
        |Allow: /a/b/
        |Sitemap: https://x.example/sitemap.xml
        |
        |User-agent: *
        |Disallow:
        |Crawl-Delay: 7
        |Disallow: /z/
        |broken line without colon
        |""".stripMargin
    val gs = Robots.parseGroups(txt)
    assert(gs.size == 2)
    assert(gs(0).agents == Vector("alphabot", "betabot"))
    assert(gs(0).rules == Vector(Rule(false, "/a/"), Rule(true, "/a/b/")))
    assert(gs(1).agents == Vector("*"))
    assert(gs(1).rules == Vector(Rule(false, "/z/"))) // empty Disallow dropped
    assert(gs(1).crawlDelay.contains(7L))
  }

  test("group selection: exact token beats *, merging, and no-group = allow-all") {
    val gs = Robots.parseGroups(
      "User-agent: a\nDisallow: /x/\n\nUser-agent: a\nDisallow: /y/\n\nUser-agent: *\nDisallow: /\n")
    val ga = Robots.selectGroup(gs, "A")
    assert(ga.rules == Vector(Rule(false, "/x/"), Rule(false, "/y/"))) // both exact groups merge
    val gb = Robots.selectGroup(gs, "other")
    assert(gb.rules == Vector(Rule(false, "/")))
    val none = Robots.selectGroup(Robots.parseGroups("User-agent: b\nDisallow: /\n"), "a")
    assert(none.rules.isEmpty && Robots.isAllowed(none.rules, "/anything"))
  }

  test("pattern matching: prefix, * wildcard, $ anchor, pattern-exhausted cases") {
    assert(Robots.patternMatches("/private/", "/private/doc1"))
    assert(!Robots.patternMatches("/private/pub/", "/private/doc1"))
    assert(Robots.patternMatches("/a*z", "/abcz"))
    assert(Robots.patternMatches("/a*z", "/abczzz"))    // prefix: may end anywhere
    assert(Robots.patternMatches("/a*z$", "/abcz"))
    assert(!Robots.patternMatches("/a*z$", "/abczX"))   // anchored rejects a tail
    assert(Robots.patternMatches("/*.php", "/dir/x.php?q=1"))
    assert(!Robots.patternMatches("/*.php$", "/dir/x.php?q=1"))
    assert(Robots.patternMatches("/a*", "/a"))          // trailing * matches empty
    assert(!Robots.patternMatches("/abc", "/ab"))       // path exhausts first
  }

  test("decision: longest match wins; Allow beats Disallow on equal length; no match allows") {
    val rules = Vector(Rule(false, "/p/"), Rule(true, "/p/pub/"))
    assert(!Robots.isAllowed(rules, "/p/x"))
    assert(Robots.isAllowed(rules, "/p/pub/x"))
    assert(Robots.isAllowed(Vector(Rule(false, "/abc/"), Rule(true, "/abc/")), "/abc/x"))
    assert(Robots.isAllowed(rules, "/elsewhere"))
  }

  test("fixture decisions match the CASE truth table for both agents (spark end-to-end)") {
    val out = Robots.decisions(Robots.plantFrontier(docs), Robots.robotsTable(spark),
        Seq("graftbot", "newsbot"))
      .collect().map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4), r.getLong(5)))
    assert(out.nonEmpty)
    for ((id, ag, an, delay) <- out) {
      val h = id % 7; val c = id % 5
      val expG = if (c == 0) false else if (c == 1) h % 2 == 0 else true
      val expN = if (c == 2) false else if (c == 3) h % 3 != 0 else true
      assert(ag == expG && an == expN && delay == 1 + h % 4, s"doc $id")
    }
  }

  test("schedule: per-host contiguous sequence spaced by crawl-delay, path-ordered") {
    val decided = Robots.decisions(Robots.plantFrontier(docs), Robots.robotsTable(spark),
      Seq("graftbot", "newsbot"))
    val sched = Robots.schedule(decided, "allowed_newsbot").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(sched.nonEmpty)
    for ((host, rows0) <- sched.groupBy(_._1)) {
      val rows = rows0.sortBy(_._3)
      assert(rows.map(_._3).toSeq == (1L to rows.length).toSeq, s"seq gap on $host")
      assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq, s"path order on $host")
      val h = host.stripPrefix("site").takeWhile(_.isDigit).toLong
      for ((_, _, seq, start) <- rows) assert(start == (seq - 1) * (1 + h % 4))
    }
    // disallowed classes never scheduled
    assert(!sched.exists(_._2.startsWith("/tmp/")))
  }
}

class MetadataSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{HtmlGen, Metadata}

  test("extract recovers all five fields from the generated page, entity-decoded") {
    val html = HtmlGen.pageWithMeta(13L, "alpha beta gamma delta epsilon zeta eta theta", "de")
    val (t, d, c, og, hl) = Metadata.extract(html)
    assert(t == "document 13")
    assert(d == "doc 13: alpha beta gamma delta epsilon zeta")
    assert(c == "https://site6.example.com/articles/doc13.html")
    assert(og == "document 13 | site6")
    assert(hl == "de")
    // the meta splice must not disturb the content path's extraction
    assert(graft.webtext.MainContent.extract(html) ==
      HtmlGen.expectedMainText("alpha beta gamma delta epsilon zeta eta theta"))
  }

  test("tag soup: metadata still resolves after an unclosed tag; absences are null") {
    // the <p> never closes, so the meta ends up NESTED under it in the
    // recovered tree — the walk must still find it (head-substring regexes
    // would too, but an unclosed <head> plus </html>-recovery would defeat
    // them; the DOM walk is position-independent)
    val soup = """<html lang="fr"><head><title>T &amp; U</title><p class="x">
                 |<meta name="description" content="a &quot;b&quot;"></head></html>""".stripMargin
    val (t, d, c, og, hl) = Metadata.extract(soup)
    assert(t == "T & U" && d == "a \"b\"" && c == null && og == null && hl == "fr")
    assert(Metadata.extract("<p>no head at all</p>") == (null, null, null, null, null))
  }

  test("short and empty documents degrade exactly like the oracle slice") {
    val (_, d2, _, _, _) = Metadata.extract(HtmlGen.pageWithMeta(4L, "one two", "en"))
    assert(d2 == "doc 4: one two")
    val (_, d0, _, _, _) = Metadata.extract(HtmlGen.pageWithMeta(4L, "", "en"))
    assert(d0 == "doc 4: ")
  }

  test("spark end-to-end matches a driver-side recompute at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Metadata.headMetadata(docs).collect()
      .map(m => m.doc_id -> ((m.title, m.description, m.canonical, m.og_title, m.html_lang))).toMap
    val local = docs.select("doc_id", "text", "lang").collect()
    assert(local.nonEmpty && got.size == local.length)
    for (r <- local) {
      val (id, text, lang) = (r.getLong(0), r.getString(1), r.getString(2))
      val exp = ("document " + id,
        s"doc $id: " + text.split(" ", -1).take(6).mkString(" "),
        s"https://site${id % 7}.example.com/articles/doc$id.html",
        s"document $id | site${id % 7}", lang)
      assert(got(id) == exp, s"doc $id")
    }
  }
}

class CharsetSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{Charset, HtmlGen}

  test("detect: BOMs beat meta; meta forms parse quoted/bare/case-insensitive") {
    assert(Charset.detect(Array(0xEF, 0xBB, 0xBF, 'x').map(_.toByte)) == (("utf-8", 3)))
    assert(Charset.detect(Array(0xFF, 0xFE, 'x', 0).map(_.toByte)) == (("utf-16le", 2)))
    assert(Charset.detect(Array(0xFE, 0xFF, 0, 'x').map(_.toByte)) == (("utf-16be", 2)))
    def meta(s: String) = Charset.detect(s.getBytes("ISO-8859-1"))
    assert(meta("""<head><meta charset="UTF-8"></head>""") == (("utf-8", 0)))
    assert(meta("""<META CHARSET='Latin1'>""") == (("iso-8859-1", 0)))
    assert(meta("""<meta charset=windows-1252>""") == (("windows-1252", 0)))
    assert(meta("""<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">""") ==
      (("iso-8859-1", 0)))
    // BOM wins even when the meta disagrees
    assert(Charset.detect((Array(0xFF, 0xFE).map(_.toByte)) ++
      "<meta charset=\"utf-8\">".getBytes("UTF-16LE")) == (("utf-16le", 2)))
  }

  test("detect is total: unknown labels, garbage, empty, null all fall back to utf-8") {
    def meta(s: String) = Charset.detect(s.getBytes("ISO-8859-1"))
    assert(meta("""<meta charset="klingon-9">""") == (("utf-8", 0)))
    // unknown first declaration, known second: scanning continues
    assert(meta("""<meta charset="nope"><meta charset="latin1">""") == (("iso-8859-1", 0)))
    assert(meta("charset") == (("utf-8", 0)))       // bare word, no '='
    assert(meta("") == (("utf-8", 0)))
    assert(Charset.detect(null) == (("utf-8", 0)))
    assert(Charset.decode(null) == (("", "utf-8", 0)))
  }

  test("every fixture class decodes to the exact page text (extraction byte-identity)") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for (cls <- 0 to 3) {
      val id = 4L + cls // ids 4,5,6,7 cover the classes
      import spark.implicits._
      val one = Seq((id, text)).toDF("doc_id", "text")
      val row = Charset.decodeExtract(Charset.encodedPages(one)).collect()(0)
      val expCs = Seq("utf-8", "utf-16le", "iso-8859-1", "utf-8")((id % 4).toInt)
      val expBom = Seq(3L, 2L, 0L, 0L)((id % 4).toInt)
      assert(row.charset == expCs && row.bom_len == expBom, s"class ${id % 4}")
      assert(row.extracted_text == HtmlGen.expectedMainText(text), s"class ${id % 4}")
    }
  }

  test("spark end-to-end at sf0.001 matches charset arithmetic + expected main text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Charset.decodeExtract(Charset.encodedPages(docs)).collect()
      .map(p => p.doc_id -> ((p.charset, p.bom_len, p.extracted_text))).toMap
    val local = docs.select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(local.nonEmpty && got.size == local.length)
    for ((id, text) <- local) {
      val expCs = Seq("utf-8", "utf-16le", "iso-8859-1", "utf-8")((id % 4).toInt)
      val expBom = Seq(3L, 2L, 0L, 0L)((id % 4).toInt)
      assert(got(id) == ((expCs, expBom, HtmlGen.expectedMainText(text))), s"doc $id")
    }
  }
}

class RedirectsSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.Redirects

  private def resolveLocal(edges: Map[String, String], u: String, maxHops: Int = 8) = {
    var cur = u; var hops = 0; val seen = scala.collection.mutable.Set.empty[String]
    var out: (String, Long, String) = null
    while (out == null) {
      if (!edges.contains(cur)) out = ("ok", hops.toLong, cur)
      else if (seen.contains(cur) || hops >= maxHops) out = ("cycle", -1L, null)
      else { seen += cur; cur = edges(cur); hops += 1 }
    }
    out
  }

  test("chains, cycles, over-limit chains, and dangling targets resolve correctly") {
    import spark.implicits._
    // a->b->c (c terminal), loop1<->loop2, a 10-hop chain (over maxHops=8),
    // and d -> missing (target never seen as a node: terminal by definition)
    val long = (0 to 10).map(i => s"L$i")
    val edges = Seq("a" -> "b", "b" -> "c", "loop1" -> "loop2", "loop2" -> "loop1", "d" -> "missing") ++
      long.sliding(2).map(p => p(0) -> p(1))
    val urls = (Seq("a", "b", "c", "loop1", "loop2", "d", "x") ++ long).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }
    val got = Redirects.resolve(urls.toDF("doc_id", "url"), edges.toDF("src", "dst"))
      .collect().map(r => r.getString(1) -> ((r.getString(2), r.getLong(3), r.getString(4)))).toMap
    assert(got("a") == (("ok", 2L, "c")))
    assert(got("b") == (("ok", 1L, "c")))
    assert(got("c") == (("ok", 0L, "c")))
    assert(got("x") == (("ok", 0L, "x")))
    assert(got("d") == (("ok", 1L, "missing")))
    assert(got("loop1") == (("cycle", -1L, null)) && got("loop2") == (("cycle", -1L, null)))
    assert(got("L0") == (("cycle", -1L, null)), "10-hop chain exceeds maxHops=8")
    assert(got("L3") == (("ok", 7L, "L10")))   // 7 hops from L3: within limit
    assert(got("L2") == (("ok", 8L, "L10")))   // exactly maxHops: still ok
  }

  test("fixture resolution matches an independent local walk at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val edges = Redirects.plantRedirects(docs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val urls = Redirects.plantUrls(docs).collect().map(r => (r.getLong(0), r.getString(1)))
    val got = Redirects.resolve(Redirects.plantUrls(docs), Redirects.plantRedirects(docs))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getString(4)))).toMap
    assert(urls.nonEmpty && got.size == urls.length)
    var cycles = 0
    for ((id, u) <- urls) {
      val exp = resolveLocal(edges, u)
      assert(got(id) == ((exp._1, exp._2, exp._3)), s"doc $id ($u)")
      if (exp._1 == "cycle") cycles += 1
    }
    assert(cycles > 0, "fixture must plant at least one cycle at this SF")
  }
}

class SitemapSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.Sitemap

  test("priorityBp is digit-exact and total") {
    assert(Sitemap.priorityBp("0.3") == 3000L)
    assert(Sitemap.priorityBp("0.35") == 3500L)
    assert(Sitemap.priorityBp("1.0") == 10000L)
    assert(Sitemap.priorityBp("1") == 10000L)
    assert(Sitemap.priorityBp("0.12345") == 1234L) // truncated at 4 places
    assert(Sitemap.priorityBp("") == -1L && Sitemap.priorityBp(null) == -1L)
    assert(Sitemap.priorityBp("x.y") == -1L && Sitemap.priorityBp(".5") == -1L)
  }

  test("parse handles urlset, sitemapindex, namespaces, junk elements, and malformed tails") {
    val us = """<?xml version="1.0"?>
               |<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
               |<sm:url><sm:loc> https://a/x </sm:loc><sm:lastmod>2021-02-03</sm:lastmod>
               |  <sm:changefreq>daily</sm:changefreq><sm:priority>0.8</sm:priority>
               |  <extra>ignored</extra></sm:url>
               |<sm:url><sm:loc>https://a/y</sm:loc></sm:url>
               |</sm:urlset>""".stripMargin
    val (urls, kids) = Sitemap.parse(us)
    assert(kids.isEmpty && urls.size == 2)
    assert(urls(0) == Sitemap.SmUrl("https://a/x", "2021-02-03", "daily", 8000L))
    assert(urls(1) == Sitemap.SmUrl("https://a/y", "", "", -1L))
    val idx = """<sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap>
                |<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    val (u2, k2) = Sitemap.parse(idx)
    assert(u2.isEmpty && k2 == Vector("https://a/s1.xml", "https://a/s2.xml"))
    // malformed tail: keep what parsed before the error
    val broken = """<urlset><url><loc>https://a/ok</loc></url><url><loc>https://a/cut"""
    assert(Sitemap.parse(broken)._1.map(_.loc) == Vector("https://a/ok"))
    assert(Sitemap.parse("")._1.isEmpty && Sitemap.parse(null)._1.isEmpty)
  }

  test("index resolution is load-bearing: even-host urls only arrive via the shard join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val blobs = Sitemap.plantSitemaps(docs)
    val got = Sitemap.urlRows(blobs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got.length == ids.length, s"${got.length} vs ${ids.length}")
    val byLoc = got.map(r => r._1 -> r).toMap
    for (id <- ids) {
      val loc = s"https://site${id % 7}.example.com/articles/doc$id.html"
      val exp = (loc, java.time.LocalDate.of(2020, 1, 1).plusDays(id % 365).toString,
        Seq("daily", "weekly", "monthly")((id % 3).toInt), (id % 10) * 1000L)
      assert(byLoc.get(loc).contains(exp), s"doc $id")
    }
    // sanity: both parities of even hosts present (both shards resolved)
    val evenHostIds = ids.filter(i => (i % 7) % 2 == 0)
    assert(evenHostIds.exists(i => (i / 7) % 2 == 0) && evenHostIds.exists(i => (i / 7) % 2 == 1))
    // dropping the shard blobs loses exactly the even-host urls
    val noShards = blobs.filter(!org.apache.spark.sql.functions.col("key").contains("sitemap-p"))
    val partial = Sitemap.urlRows(noShards).collect().map(_.getString(0)).toSet
    assert(partial == ids.filter(i => (i % 7) % 2 == 1)
      .map(i => s"https://site${i % 7}.example.com/articles/doc$i.html").toSet)
  }
}

class MirrorsSpec extends AnyFunSuite {
  import SparkSuite._

  test("mirror detection: set semantics, order independence, subsets excluded") {
    import spark.implicits._
    val docs = Seq(
      // a and b: same content set, different arrival order -> mutual mirrors
      ("a.com", "alpha"), ("a.com", "beta"), ("a.com", "gamma"),
      ("b.com", "gamma"), ("b.com", "alpha"), ("b.com", "beta"),
      // c: a's set PLUS one page -> not a mirror of a
      ("c.com", "alpha"), ("c.com", "beta"), ("c.com", "gamma"), ("c.com", "delta"),
      // d: duplicate text within host collapses -> mirrors a and b
      ("d.com", "alpha"), ("d.com", "alpha"), ("d.com", "beta"), ("d.com", "gamma"),
      // e: subset of a -> not a mirror
      ("e.com", "alpha"), ("e.com", "beta")
    ).toDF("host", "text")
    val got = graft.webtext.Mirrors.mirrorHosts(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got("a.com") == ((3L, "b.com")))  // min partner of {b, d}
    assert(got("b.com") == ((3L, "a.com")))
    assert(got("d.com") == ((3L, "a.com")))
    assert(got("c.com") == ((4L, "")))
    assert(got("e.com") == ((2L, "")))
  }
}

class PrefixTrimSpec extends AnyFunSuite {
  import SparkSuite._

  test("LCP identity: set prefix = lcp(min, max); unrelated host untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a.com", "NAV | alpha body"),
      (2L, "a.com", "NAV | beta body"),
      (3L, "a.com", "NAV | NAVEL text"),   // shares only "NAV | " with the others
      (4L, "b.com", "no banner here"),
      (5L, "b.com", "zero shared prefix")
    ).toDF("doc_id", "host", "text")
    val got = graft.webtext.Templates.prefixTrim(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((6L, "alpha body")))
    assert(got(2L) == ((6L, "beta body")))
    assert(got(3L) == ((6L, "NAVEL text")))
    assert(got(4L) == ((0L, "no banner here")))
    assert(got(5L) == ((0L, "zero shared prefix")))
  }
}

class MarkdownSpec extends AnyFunSuite {
  import graft.webtext.Markdown

  private def words(n: Int): String = (1 to n).map("word" + _).mkString(" ")

  /** The render the generator's markup arithmetic implies (mirrors the
    * DuckDB oracle): heading + blank-line-joined paragraphs, bold first word
    * when p%3==1, trailing link when p%3==2. */
  private def expectedMarkdown(docId: Long, text: String): String = {
    val blocks = Vector.newBuilder[String]
    blocks += s"# document $docId"
    HtmlGen.paragraphTexts(text).zipWithIndex.foreach { case (para, p) =>
      val ws = para.split(" ", -1)
      val m =
        if (p % 3 == 1)
          "**" + ws.head + "**" + (if (ws.length > 1) " " + ws.tail.mkString(" ") else "")
        else if (p % 3 == 2)
          (if (ws.length > 1) ws.init.mkString(" ") + " " else "") +
            s"[${ws.last}](/w/$docId/$p)"
        else para
      blocks += m
    }
    blocks.result().mkString("\n\n")
  }

  test("inline and block rules on handcrafted HTML") {
    val html = "<html><body><article><h2>t</h2>\n" +
      "<p>a <b>b</b> <i>c</i> <code>d</code> <a href=\"/x\">e</a></p></article></body></html>"
    assert(Markdown.render(html) == "## t\n\na **b** *c* `d` [e](/x)")
  }

  test("generated pages render byte-identically to the markup arithmetic across sizes") {
    for (docId <- 0L until 24L; n <- Seq(1, 10, 24, 25, 48, 73, 100)) {
      val text = words(n)
      val got = Markdown.render(HtmlGen.page(docId, text))
      assert(got == expectedMarkdown(docId, text), s"docId=$docId n=$n")
    }
  }

  test("wrapper tie-break is render-invariant: odd (wrapped) and even pages emit the same block shape") {
    val text = words(73)
    val odd = Markdown.render(HtmlGen.page(1L, text))
    val even = Markdown.render(HtmlGen.page(2L, text))
    // same blocks modulo the doc_id embedded in heading and link targets
    assert(odd.replace("document 1", "D").replace("/w/1/", "/w/") ==
      even.replace("document 2", "D").replace("/w/2/", "/w/"))
  }

  test("paragraph spans address the extracted text exactly") {
    for (docId <- Seq(0L, 1L, 7L); n <- Seq(1, 24, 25, 73)) {
      val html = HtmlGen.page(docId, words(n))
      val extracted = MainContent.extract(html)
      val spans = MainContent.paragraphSpans(html)
      assert(spans.nonEmpty)
      val paras = extracted.split("\n", -1)
      assert(spans.length == paras.length)
      spans.foreach { case (p, s, e) =>
        assert(extracted.substring(s, e) == paras(p), s"docId=$docId n=$n p=$p")
      }
      // spans tile the text: consecutive, 1-char joints, full coverage
      assert(spans.head._2 == 0 && spans.last._3 == extracted.length)
      spans.sliding(2).foreach {
        case Vector((_, _, e1), (_, s2, _)) => assert(s2 == e1 + 1)
        case _ => ()
      }
    }
  }
}

class ParagraphDedupSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{HtmlGen, WebText}

  private def chunk(prefix: String): String = (1 to 24).map(prefix + _).mkString(" ")

  // doc 1 = A B; doc 2 = A C (A is a dup); doc 3 = A B (fully duplicate)
  private val A = chunk("a"); private val B = chunk("b"); private val C = chunk("c")

  private def pages = {
    import spark.implicits._
    WebText.htmlPages(Seq(
      (1L, s"$A $B", "en"),
      (2L, s"$A $C", "en"),
      (3L, s"$A $B", "en")).toDF("doc_id", "text", "lang")).toDF()
  }

  test("audit: first-occurrence flags, copy counts, span addressing") {
    val got = WebText.paragraphDedup(pages).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val la = A.length.toLong
    assert(got(("doc://1", 0L)) == ((0L, la, 1L, 3L)))            // A: first of 3
    assert(got(("doc://1", 1L)) == ((la + 1, la + 1 + B.length, 1L, 2L))) // B: first of 2
    assert(got(("doc://2", 0L)) == ((0L, la, 0L, 3L)))            // A copy
    assert(got(("doc://2", 1L))._3 == 1L)                          // C unique
    assert(got(("doc://3", 0L)) == ((0L, la, 0L, 3L)))
    assert(got(("doc://3", 1L))._3 == 0L)
  }

  test("clean: later duplicates cut, order kept, fully-duplicate page drops out") {
    val got = WebText.paragraphDedupClean(pages).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got("doc://1") == ((s"$A\n$B", 2L)))
    assert(got("doc://2") == ((C, 1L)))       // A cut, C kept
    assert(!got.contains("doc://3"))          // nothing survives
  }

  test("clean on a dup-free corpus is the identity extraction") {
    import spark.implicits._
    val docs = Seq((1L, chunk("x"), "en"), (2L, chunk("y") + " " + chunk("z"), "en"))
      .toDF("doc_id", "text", "lang")
    val p = WebText.htmlPages(docs).toDF()
    val got = WebText.paragraphDedupClean(p).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("doc://1") == HtmlGen.expectedMainText(chunk("x")))
    assert(got("doc://2") == HtmlGen.expectedMainText(chunk("y") + " " + chunk("z")))
  }
}

class StreamParagraphDedupSpec extends AnyFunSuite {
  import SparkSuite._

  test("drained streaming state equals the batch first-occurrence groups at sf0.001") {
    val got = pageplus.streaming.StreamingExtract.paragraphDedupOnce(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // batch recompute from the audit surface: first rows carry the group size
    val batch = graft.webtext.WebText.paragraphDedup(
      graft.webtext.WebText.htmlPages(spark.read.parquet(s"$sf/documents.parquet")).toDF())
      .collect().filter(_.getLong(4) == 1L)
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(got == batch)
  }
}

class StreamScd2Spec extends AnyFunSuite {
  import SparkSuite._

  test("drained streaming SCD2 equals the batch lead() dimension table at sf0.001") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val got = pageplus.streaming.StreamingExtract.scd2Once(spark, sf)
      .collect().map(key).toSet
    val batch = graft.webtext.Recrawl.scd2(
        graft.webtext.AsofJoin.plantSnapshots(spark.read.parquet(s"$sf/documents.parquet")))
      .collect().map(key).toSet
    assert(got == batch)
    assert(got.nonEmpty)
    // state discipline: exactly one open interval per key, and every closed
    // interval's valid_to equals the next version's valid_from (chained)
    val byK = got.groupBy(_._1)
    byK.foreach { case (k, rows) =>
      assert(rows.count(_._4 == -1L) == 1, s"key $k must have one open interval")
      val sorted = rows.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 == b._3, s"key $k interval chain broken")
        case _ => ()
      }
    }
  }
}
