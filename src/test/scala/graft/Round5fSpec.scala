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
