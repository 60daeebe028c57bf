package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: adaptive recrawl intervals, eTLD+1 extraction,
  * structured HTML-table mining. */
class RecrawlIntervalSpec extends AnyFunSuite {
  import SparkSuite._

  test("recrawl_interval matches a driver-side recompute on sf0.001") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = SparkEntry.queries("recrawl_interval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    val expected = ids.map { k =>
      val caps = k % 5 + 1
      val ts = (0L until caps).map(v => 1704067200L + v * 3600L * (k % 41 + 1) + (k % 97) * 60L)
      val changes = caps - 1
      val est =
        if (changes == 0) 86400L
        else math.min(math.max((ts.max - ts.min) / changes, 7200L), 86400L)
      val tier =
        if (changes == 0) "unseen"
        else if (est <= 28800L) "hot"
        else if (est < 86400L) "warm"
        else "cold"
      (k, caps, changes, est, ts.max + est, tier)
    }
    assert(got.toSeq == expected.toSeq)
    // every tier class must be exercised by the fixture
    assert(got.map(_._6).distinct.toSet == Set("unseen", "hot", "warm", "cold"))
  }
}

class RegisteredDomainSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.UrlOps

  private def reg(hosts: Seq[String]): Map[String, (String, String)] = {
    import spark.implicits._
    UrlOps.withRegisteredDomain(hosts.toDF("host"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  test("PSL semantics on hosts OUTSIDE the planted fixture") {
    val got = reg(Seq(
      "x.y.blogspot.com",    // private registry, deep subdomain
      "foo.gov.uk",          // 2-label ccTLD registry, host == regdom
      "com",                 // bare single-label public suffix -> no regdom
      "sub.domain.de",       // plain ccTLD
      "deep.a.b.github.io",  // private registry, 3 extra labels
      "uk",                  // bare ccTLD (single label -> registers itself)
      "10.0.0.1",            // IPv4
      "server42"))           // single label
    assert(got("x.y.blogspot.com") == ("blogspot.com", "y.blogspot.com"))
    assert(got("foo.gov.uk") == ("gov.uk", "foo.gov.uk"))
    assert(got("com") == ("com", "")) // bare public suffix: nothing registrable
    assert(got("sub.domain.de") == ("de", "domain.de"))
    assert(got("deep.a.b.github.io") == ("github.io", "b.github.io"))
    assert(got("uk") == ("uk", ""))
    assert(got("10.0.0.1") == ("", "10.0.0.1"))
    assert(got("server42") == ("", "server42"))
  }

  test("bare multi-label public suffix has no registrable domain") {
    assert(reg(Seq("co.uk"))("co.uk") == ("co.uk", ""))
    assert(reg(Seq("github.io"))("github.io") == ("github.io", ""))
  }

  test("longest suffix wins over its single-label tail") {
    // .uk would also match — co.uk must win
    assert(reg(Seq("a.b.co.uk"))("a.b.co.uk") == ("co.uk", "b.co.uk"))
    // .com would also match — blogspot.com must win
    assert(reg(Seq("me.blogspot.com"))("me.blogspot.com") == ("blogspot.com", "me.blogspot.com"))
  }

  test("registered_domain query matches the fixture recompute on sf0.001") {
    val got = SparkEntry.queries("registered_domain")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    got.foreach { case (id, host, suffix, rd) =>
      val (es, er) = (id % 10) match {
        case 0 => ("co.uk", s"news${id % 5}.co.uk")
        case 1 => ("github.io", s"blog${id % 7}.github.io")
        case 2 => ("com", "example.com")
        case 3 => if (id % 9 == 0) ("co.uk", "") else ("com.au", s"corp${id % 3}.com.au")
        case 4 => ("org", s"deep${id % 4}.org")
        case 5 => ("net", s"cdn${id % 6}.net")
        case 6 => ("co.jp", s"shop${id % 5}.co.jp")
        case 7 => ("", host)
        case 8 => ("zz", "example.zz")
        case _ => ("", "localhost")
      }
      assert((suffix, rd) == (es, er), s"doc $id host $host")
    }
    assert(got.length > 0)
  }
}

class FeedsSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.Feeds

  test("parse handles both formats; channel title never leaks into items") {
    val rss = """<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>channel name</title>
      |<item><title>a &amp; b</title><link>http://x/1</link><pubDate>2020-01-02</pubDate></item>
      |<item><title>second</title><link>http://x/2</link></item>
      |</channel></rss>""".stripMargin
    assert(Feeds.parse(rss) == ("rss", Vector(("a & b", "http://x/1", "2020-01-02"),
      ("second", "http://x/2", ""))))
    val atom = """<feed xmlns="http://www.w3.org/2005/Atom"><title>chan</title>
      |<entry><title>e1</title><link href="http://y/1"/><updated>2021-05-05</updated></entry>
      |</feed>""".stripMargin
    assert(Feeds.parse(atom) == ("atom", Vector(("e1", "http://y/1", "2021-05-05"))))
  }

  test("malformed XML degrades to the items parsed before the error") {
    val broken = """<rss><channel>
      |<item><title>ok</title><link>http://x/1</link></item>
      |<item><title>cut""".stripMargin
    assert(Feeds.parse(broken) == ("rss", Vector(("ok", "http://x/1", ""))))
    assert(Feeds.parse("") == ("", Vector.empty))
    assert(Feeds.parse("not xml at all") == ("", Vector.empty))
  }

  test("feed_items matches a driver-side recompute on sf0.001") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val got = SparkEntry.queries("feed_items")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getString(4), r.getString(5)))
    val expected = ids.sorted.flatMap { k =>
      (0L until (1 + k % 4)).map { i =>
        val title = s"item $k $i" + (if ((k + i) % 5 == 0) " & news" else "")
        val stamp = java.time.LocalDate.of(2020, 1, 1).plusDays((k + i) % 365).toString
        (k, if (k % 2 == 0) "rss" else "atom", i, title,
          s"https://site${k % 7}.example.com/a/$k/$i", stamp)
      }
    }
    assert(got.toSeq == expected.toSeq)
  }
}

class OptOutGateSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.Metadata

  test("robotsDirectives: case-insensitive name, trimmed lowercased tokens") {
    assert(Metadata.robotsDirectives(
      """<html><head><meta name="ROBOTS" content=" NOINDEX , NoFollow "></head></html>""")
      == Set("noindex", "nofollow"))
    assert(Metadata.robotsDirectives("<html><head></head><body></body></html>") == Set.empty)
    // description meta must not be mistaken for robots
    assert(Metadata.robotsDirectives(
      """<html><head><meta name="description" content="noindex"></head></html>""") == Set.empty)
  }

  test("optout_gate matches the fixture recompute; unrelated directives don't trip it") {
    val got = SparkEntry.queries("optout_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    got.foreach { case (id, raw, ni, nf, na, keep) =>
      val m = id % 6
      val eraw = Seq("noindex", "noai, noimageai", "index, follow", "", "NOINDEX,NOFOLLOW", "max-snippet:-1")(m.toInt)
      assert(raw == eraw, s"doc $id raw")
      assert(ni == (m == 0 || m == 4) && nf == (m == 4) && na == (m == 1), s"doc $id flags")
      assert(keep == !(m == 0 || m == 1 || m == 4), s"doc $id keep")
    }
    assert(got.map(_._6).toSet == Set(true, false))
  }
}

class JsonLdSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.JsonLd
  import graft.webtext.JsonLd._

  test("JSON parser: escapes, unicode, nesting, raw numbers, rejects garbage") {
    assert(parse("""{"a":"x\"y\\z\n","n":-12,"f":1.5e3,"b":true,"z":null,"arr":[1,{"k":"v"}]}""")
      .contains(JObj(Vector(
        "a" -> JStr("x\"y\\z\n"), "n" -> JNum("-12"), "f" -> JNum("1.5e3"),
        "b" -> JBool(true), "z" -> JNull,
        "arr" -> JArr(Vector(JNum("1"), JObj(Vector("k" -> JStr("v")))))))))
    assert(parse("""{"u":"éA"}""").contains(JObj(Vector("u" -> JStr("éA")))))
    assert(parse("""{"a":}""").isEmpty)
    assert(parse("""{"a":1} trailing""").isEmpty)
    assert(parse("""{"a":1""").isEmpty)
    assert(parse("").isEmpty)
  }

  test("extractBlocks finds only ld+json scripts; articleOf skips decoys and malformed") {
    val html = """<html><head>
      |<script>var x = 1;</script>
      |<script type="application/ld+json">{"@type":"Article","headline":</script>
      |<script type="application/ld+json">{"@type":"BreadcrumbList"}</script>
      |<script type="application/ld+json">{"@type":"Article","headline":"h","datePublished":"2020-02-03","author":"me","wordCount":7}</script>
      |</head><body></body></html>""".stripMargin
    assert(JsonLd.extractBlocks(html).length == 3)
    assert(JsonLd.articleOf(9L, html).contains(ArticleMeta(9L, "h", "2020-02-03", "me", 7L)))
    // author as Person object
    val h2 = """<script type="application/ld+json">{"@type":"Article","author":{"@type":"Person","name":"pn"}}</script>"""
    assert(JsonLd.articleOf(1L, h2).contains(ArticleMeta(1L, "", "", "pn", -1L)))
  }

  test("jsonld_articles matches a driver-side recompute on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val got = SparkEntry.queries("jsonld_articles")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val expected = docs.filter(_._1 % 11 != 3).map { case (k, text) =>
      (k, s"document $k" + (if (k % 7 == 0) " \"brief\"" else ""),
        java.time.LocalDate.of(2020, 1, 1).plusDays(k % 365).toString,
        s"author ${k % 13}",
        (if (text == null) "" else text).split(" ", -1).length.toLong)
    }
    assert(got.toSeq == expected.toSeq)
  }
}

class IvfPqSpec extends AnyFunSuite {
  import SparkSuite._

  test("ann_ivfpq matches an independent driver-side mirror on sf0.001") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // trunc toward zero — the engine's fixed-point rule
    def quant(v: Array[Float]): Array[Long] = v.map(x => (x.toDouble * 4096).toLong)
    val q = emb.map { case (id, v) => id -> quant(v) }.toMap
    val ids = emb.map(_._1)
    val head = ids.take(10000)
    val ns = head.length
    def sqd(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val cls = Array.tabulate(16)(i => q(head(i * (ns / 16))))
    val cent = Array.tabulate(64)(i => q(head(i * (ns / 64))))
    def sub(a: Array[Long], s: Int) = a.slice(s * 4, s * 4 + 4)
    def codesOf(v: Array[Long]) = Array.tabulate(16)(s =>
      (0 until 64).minBy(c => (sqd(sub(v, s), sub(cent(c), s)), c)))
    val lasn = ids.map(id => id -> (0 until 16).minBy(c => (sqd(q(id), cls(c)), c))).toMap
    val codes = ids.map(id => id -> codesOf(q(id))).toMap
    val expected = ids.take(5).flatMap { qid =>
      val lut = Array.tabulate(16, 64)((s, c) => sqd(sub(q(qid), s), sub(cent(c), s)))
      val probed = (0 until 16).sortBy(c => (sqd(q(qid), cls(c)), c)).take(4).toSet
      val scored = ids.filter(id => id != qid && probed(lasn(id)))
        .map(id => (id, (0 until 16).map(s => lut(s)(codes(id)(s))).sum))
        .sortBy { case (id, d) => (d, id) }.take(5)
      val bf = ids.filter(_ != qid).map(id => (id, sqd(q(qid), q(id))))
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      scored.zipWithIndex.map { case ((id, d), r) =>
        (qid, id, (r + 1).toLong, d, if (bf(id)) 1L else 0L)
      }
    }
    val got = SparkEntry.queries("ann_ivfpq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == expected.toSeq)
  }
}

class HtmlTablesSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{HtmlGen, WebText}

  test("tableCells recovers every generated cell with addressing + decoded entities") {
    import spark.implicits._
    val docs = Seq((4L, "alpha beta gamma", "en"), (7L, "one two", "de"))
      .toDF("doc_id", "text", "lang")
    val got = WebText.tableCells(WebText.tablePages(docs).toDF()).collect()
      .map(c => (c.url, c.table_idx, c.row_idx, c.col_idx, c.is_header, c.cell)).toSet
    val expected = Seq(4L -> "alpha beta gamma", 7L -> "one two").flatMap { case (id, _) =>
      val c = (2 + id % 2).toInt
      val r = (2 + id % 3).toInt
      val hdr = (0 until c).map(j => (s"doc://$id", 0L, 0L, j.toLong, true, s"h$j"))
      val dat = for { i <- 0 until r; j <- 0 until c } yield
        (s"doc://$id", 0L, (1 + i).toLong, j.toLong, false,
          s"v${id * 7 + i * c + j}" + (if ((i + j) % 3 == 0) " & x" else ""))
      val ext = if (id % 4 == 0)
        for { i <- 0 until 2; j <- 0 until 2 } yield
          (s"doc://$id", 1L, i.toLong, j.toLong, false, s"w${id + 2 * i + j}")
      else Nil
      hdr ++ dat ++ ext
    }.toSet
    assert(got == expected)
    // the entity trap really exercises decode: raw html has &amp;, cells have &
    val raw = HtmlGen.pageWithTables(4L, "alpha beta gamma")
    assert(raw.contains("&amp; x"))
    assert(got.exists(_._6.endsWith(" & x")))
  }

  test("table splice leaves the main-content extraction byte-identical") {
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20 w21 w22 w23 w24 w25"
    val base = graft.webtext.MainContent.extract(HtmlGen.page(11L, text))
    val withT = graft.webtext.MainContent.extract(HtmlGen.pageWithTables(11L, text))
    assert(base == HtmlGen.expectedMainText(text))
    assert(withT == base)
  }
}
