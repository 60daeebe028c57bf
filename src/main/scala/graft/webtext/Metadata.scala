package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.webtext.HtmlDom.HElem

/** HTML head-metadata extraction — the document-augmentation companion to
  * main-content extraction (reference scope analogue: PagePlus reads PAGE-XML
  * `Metadata`; a web-text engine mines the HTML head): title, meta
  * description, canonical link, og:title, and the `<html lang>` hint. These
  * feed curation directly — canonical urls collapse syndicated duplicates
  * before any content hashing, the lang attribute seeds language-ID priors,
  * and title/description become retrieval/labeling text.
  *
  * Extraction is a real DOM walk over [[HtmlDom]]'s tree (first matching
  * element wins, entity-decoded attribute values), NOT head-substring
  * regexes — the same tag-soup recovery rules as the main-content path, so
  * a `<meta>` buried after an unclosed tag still resolves.
  *
  * Scale shape: map-side per-row parse inside `mapPartitions`, zero
  * shuffle; the head is at the front of the byte stream so the walk cost is
  * dominated by the same parse the content path already pays (at 10^12 rows
  * the two extractions should share one parse — composed in the fused
  * pipeline; standalone here for the oracle surface).
  */
object Metadata {

  final case class PageMeta(doc_id: Long, title: String, description: String,
                            canonical: String, og_title: String, html_lang: String)

  /** First-match head-metadata walk. Absent fields are null (SQL-friendly). */
  def extract(html: String): (String, String, String, String, String) = {
    val root = HtmlDom.parse(html)
    def first(p: HElem => Boolean): Option[HElem] = HtmlDom.find(root, p).headOption
    val title = first(_.tag == "title").map(HtmlDom.textOf).orNull
    val desc = first(e => e.tag == "meta" && e.attr("name").contains("description"))
      .flatMap(_.attr("content")).orNull
    val canon = first(e => e.tag == "link" && e.attr("rel").contains("canonical"))
      .flatMap(_.attr("href")).orNull
    val og = first(e => e.tag == "meta" && e.attr("property").contains("og:title"))
      .flatMap(_.attr("content")).orNull
    val lang = first(_.tag == "html").flatMap(_.attr("lang")).orNull
    (title, desc, canon, og, lang)
  }

  /** documents -> per-doc head metadata over the deterministic
    * [[HtmlGen.pageWithMeta]] payload. */
  def headMetadata(docs: DataFrame): Dataset[PageMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, lang) =>
        val (t, d, c, og, hl) = extract(HtmlGen.pageWithMeta(id, text, lang))
        PageMeta(id, t, d, c, og, hl)
      })
  }
}
