package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Soft-404 detection — error pages served with HTTP 200 are a top-tier crawl
  * pollutant: they carry host templates and near-identical apology text, so
  * left in they flood dedup clusters and teach an LM to apologize. Standard
  * practice (CDX pipelines, FineWeb's url filters) is a content classifier at
  * the extraction edge: title markers ("404", "not found") plus a
  * tiny-main-content + apology-phrase fallback for hosts that serve blank
  * titles.
  *
  * Scale shape: fused with the HTML parse in ONE map stage over the page
  * bytes — the classifier reuses the already-built DOM + main-content
  * extraction, adding zero passes and zero shuffles. Output is doc-grain.
  */
object Soft404 {

  /** The 8-word apology the error fixture serves (and the detector's
    * fallback phrase). */
  val Apology = "the page you requested could not be found"

  /** Deterministic page mix: doc_id%13==0 serves a realistic soft-404 (200
    * page with a 404 title, tiny apology content, nav/footer chrome); the
    * rest serve the standard [[HtmlGen.page]]. */
  def plantPages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val html =
        if (id % 13 == 0) errorPage(id)
        else HtmlGen.page(id, text)
      (id, html)
    }.toDF("doc_id", "html")
  }

  def errorPage(docId: Long): String =
    s"""<!DOCTYPE html>
       |<html><head><title>404 not found - document $docId</title></head>
       |<body>
       |<nav><a href="/">homepage</a> <a href="/search">sitesearch</a></nav>
       |<h1>error 404</h1>
       |<div class="error"><p class="apology">$Apology</p></div>
       |<footer><p>(c) 2026 example corp</p></footer>
       |</body></html>
       |""".stripMargin

  /** Classify each page: (doc_id, is_soft404, n_main_words). Title markers
    * decide; the fallback catches blank-title hosts via tiny main content
    * containing the apology phrase. */
  def detect(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select("doc_id", "html").as[(Long, String)].map { case (id, html) =>
      val root = HtmlDom.parse(html)
      val title = HtmlDom.find(root, _.tag == "title").headOption
        .map(t => HtmlDom.textOf(t).toLowerCase) .getOrElse("")
      val main = MainContent.extract(html)
      val nWords = if (main.isEmpty) 0L else main.split("\\s+").length.toLong
      // phrase-level markers, deliberately NOT a bare "404" substring: page
      // ids/years/SKUs in titles ("document 404") false-positive on the bare
      // number — the fixture corpus contains exactly that trap at doc_id 404
      val soft = title.contains("not found") || title.contains("error 404") ||
        (nWords < 12 && main.toLowerCase.contains(Apology))
      (id, if (soft) 1L else 0L, nWords)
    }.toDF("doc_id", "is_soft404", "n_main_words")
  }
}
