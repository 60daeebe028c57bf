package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: hreflang translation-family mining and index-aligned
  * bitext pairing with the integer Gale-Church length-ratio gate. */
class MultilingualMiningSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{Hreflang, HtmlGen, WebText}
  import graft.textops.Bitext

  test("parseAlternates: well-formed links in order, malformed (no href) skipped, x-default kept") {
    val html = HtmlGen.pageWithHreflang(45L, "a b c") // 45%4=1 -> en,de; 45%5=0 -> x-default; 45%9=0 -> malformed pt
    val alts = Hreflang.parseAlternates(html)
    assert(alts == Seq(
      ("en", "https://site3.example.com/en/doc45.html"),
      ("de", "https://site3.example.com/de/doc45.html"),
      ("x-default", "https://site3.example.com/en/doc45.html")))
  }

  test("clusters match per-doc arithmetic: min-href key, x-default excluded, n_langs = variant count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Hreflang.clusters(WebText.hreflangPages(docs).toDF()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val langs = HtmlGen.HreflangLangs
    val exp = docs.select("doc_id").collect().map(_.getLong(0)).flatMap { id =>
      val nv = (1 + id % 4).toInt
      val hrefs = langs.take(nv).map(l => l -> s"https://site${id % 7}.example.com/$l/doc$id.html")
      val cluster = hrefs.map(_._2).min
      hrefs.map { case (l, h) => (cluster, l, h, nv.toLong) }
    }.toSet
    assert(got == exp)
  }

  test("family key is computed map-side: only family-grain rows shuffle, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = Hreflang.clusters(WebText.hreflangPages(docs).toDF())
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop"), fin)
  }

  test("segmentWords: 12-word windows, last window short, indices dense from 0") {
    import spark.implicits._
    val text = (1 to 30).map("w" + _).mkString(" ")
    val got = Bitext.segmentWords(Seq((7L, text)).toDF("doc_id", "text")).collect()
      .map(s => (s.sent_idx, s.sent)).sortBy(_._1)
    assert(got.length == 3)
    assert(got(0) == (0L, (1 to 12).map("w" + _).mkString(" ")))
    assert(got(2) == (2L, (25 to 30).map("w" + _).mkString(" ")))
  }

  test("pseudoTranslated: reversal preserves length; idx%3==2 truncates to 4 words") {
    import spark.implicits._
    val text = (1 to 36).map("w" + _).mkString(" ")
    val got = Bitext.pseudoTranslated(Seq((7L, text)).toDF("doc_id", "text")).collect()
      .map(s => s.sent_idx -> s.sent).toMap
    assert(got(0L) == (12 to 1 by -1).map("w" + _).mkString(" "))
    assert(got(2L) == Seq(36, 35, 34, 33).map("w" + _).mkString(" "))
  }

  test("ratio gate is integer-exact at the 13/10 boundary") {
    import spark.implicits._
    // lengths (13, 10): 13*10 <= 10*13 — accept exactly at the bound;
    // (14, 10): 14*10 > 10*13 — reject one char past it
    val src = Seq(Bitext.Sent(1L, 0L, "x" * 13), Bitext.Sent(1L, 1L, "x" * 14)).toDS()
    val tgt = Seq(Bitext.Sent(1L, 0L, "y" * 10), Bitext.Sent(1L, 1L, "y" * 10)).toDS()
    val got = Bitext.alignByIndex(src, tgt).collect()
      .map(r => r.getLong(1) -> r.getLong(6)).toMap
    assert(got == Map(0L -> 1L, 1L -> 0L))
  }

  test("microdata scoping: nearest-ancestor rule, nested Person value, decoy skipped, meta content, entity decode") {
    import graft.webtext.{HtmlDom, Microdata}
    // decoy BreadcrumbList first; Article with nested Person author; a
    // deeper anonymous nested scope whose props must NOT leak upward
    val html =
      """<div itemscope itemtype="https://schema.org/BreadcrumbList"><span itemprop="name">crumb</span></div>
        |<div itemscope itemtype="https://schema.org/Article">
        |<span itemprop="headline">A &amp; B</span>
        |<span itemprop="author" itemscope itemtype="https://schema.org/Person"><span itemprop="name">jo</span></span>
        |<div itemscope><span itemprop="name">leak</span></div>
        |<meta itemprop="wordCount" content="42">
        |</div>""".stripMargin
    val root = HtmlDom.parse(html)
    val scopes = HtmlDom.find(root, e =>
      e.attr("itemscope").isDefined && e.attr("itemtype").contains("https://schema.org/Article"))
    assert(scopes.size == 1)
    val props = Microdata.scopeProps(scopes.head).toMap
    assert(props == Map("headline" -> "A & B", "author" -> "jo", "wordCount" -> "42"))
  }

  test("microdata_items matches per-doc arithmetic on both author shapes") {
    import graft.webtext.{Microdata, WebText}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Microdata.articles(WebText.microdataPages(docs).toDF()).collect()
      .map(r => (r.url, r.headline, r.author, r.word_count)).toSet
    val exp = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => id % 11 != 3 }
      .map { case (id, t) =>
        (s"doc://$id",
          s"document $id" + (if (id % 7 == 0) " & co" else ""),
          s"author ${id % 13}",
          t.split(" ", -1).length.toLong)
      }.toSet
    assert(got == exp)
  }

  test("stratified_sample: exact budget, per-stratum counts equal Hamilton quotas, reproducible under repartition") {
    import graft.textops.{Curate, TextHash}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Curate.stratifiedSample(docs, budget = 20L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 20, s"exact allocation: ${got.length}")
    // independent Scala recompute of the apportionment + selection
    val rows = docs.select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val strata = rows.groupBy { case (_, t, lang) =>
      s"$lang|${math.min((if (t == null) 0 else t.length).toLong / 256L, 3L)}" }
    val n = rows.length.toLong
    val base = strata.view.mapValues(v => 20L * v.length / n).toMap
    val rem = strata.view.mapValues(v => 20L * v.length % n).toMap
    val leftover = 20L - base.values.sum
    val seats = strata.keys.toSeq.sortBy(s => (-rem(s), s)).zipWithIndex
      .map { case (s, i) => s -> (if (i < leftover) 1L else 0L) }.toMap
    val quota = strata.map { case (s, v) => s -> math.min(base(s) + seats(s), v.length.toLong) }
    val exp = strata.toSeq.flatMap { case (s, v) =>
      v.toSeq.map { case (id, _, _) =>
        (java.lang.Long.remainderUnsigned(TextHash.fnv64(s"strat:$id"), 1L << 32), id) }
        .sorted.take(quota(s).toInt).zipWithIndex
        .map { case ((_, id), i) => (id, s, i.toLong + 1, quota(s), v.length.toLong) }
    }.toSet
    assert(got.toSet == exp)
    // partitioning must not change the sample
    val reGot = Curate.stratifiedSample(docs.repartition(7), budget = 20L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(reGot == got.toSet)
  }

  test("stratified_sample plans the constant-B WindowGroupLimit cap and a broadcast quota join") {
    import graft.textops.Curate
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fin = Curate.stratifiedSample(docs, budget = 20L)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(fin.contains("WindowGroupLimit"), s"constant cap must push down:\n$fin")
    assert(fin.contains("BroadcastHashJoin"), s"quota join must broadcast:\n$fin")
  }

  test("drained stream_bitext equals the batch bitext_mine answer") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val batch = rows(SparkEntry.queries("bitext_mine")(spark, sf))
    val stream = rows(SparkEntry.queries("stream_bitext")(spark, sf))
    assert(stream == batch)
  }

  test("host_lang_audit equals a driver-side recompute (majority tie-break included)") {
    import graft.textops.{Multilingual, TextHash}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Multilingual.hostLangAudit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toSet
    val per = docs.select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .map { case (id, t, declared) =>
        (s"site${id % 7}.example.com", TextHash.langIdDetail(t)._1, declared) }
    val exp = per.groupBy(_._1).map { case (host, rows) =>
      val counts = rows.groupBy(_._2).map { case (l, g) => (l, g.size.toLong) }
      val (maj, majN) = counts.toSeq.minBy { case (l, c) => (-c, l) }
      (host, rows.size.toLong, rows.count(r => r._2 != r._3).toLong, maj, majN)
    }.toSet
    assert(got == exp)
  }

  test("shard_checksum is layout-invariant; counts catch the XOR blind spot") {
    import spark.implicits._
    import graft.textops.Integrity
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(Integrity.shardChecksums(docs)) ==
      rows(Integrity.shardChecksums(docs.repartition(13))),
      "checksums must not depend on physical layout")
    // documented blind spot: an identical pair XOR-cancels — n_docs catches it
    val dup = Seq((0L, "x"), (8L, "x")).toDF("doc_id", "text")
    val got = rows(Integrity.shardChecksums(dup))
    assert(got == Set((0L, 2L, 2L, 0L)), s"got $got")
  }

  test("bitext_mine plans one narrow-key join — no cartesian, no corpus re-read surprises") {
    val df = SparkEntry.queries("bitext_mine")(spark, sf)
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoop"), fin)
    val accepted = df.filter(org.apache.spark.sql.functions.col("pair_ok") === 1L).count()
    val total = df.count()
    assert(total > 0 && accepted > 0 && accepted < total,
      s"gate must split the fixture into both classes: $accepted/$total")
  }
}
