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

  final case class RobotsGate(doc_id: Long, robots_meta: String, noindex: Boolean,
                              nofollow: Boolean, noai: Boolean, keep_for_training: Boolean)

  /** Directive set of the first `meta[name=robots]` (name matched
    * case-insensitively, content split on commas, tokens trimmed +
    * lowercased — the spec's parsing rules). Empty set when absent. */
  def robotsDirectives(html: String): Set[String] = {
    val root = HtmlDom.parse(html)
    HtmlDom.find(root, e => e.tag == "meta" &&
        e.attr("name").exists(_.equalsIgnoreCase("robots")))
      .headOption.flatMap(_.attr("content")) match {
      case Some(c) => c.split(",").iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
      case None => Set.empty
    }
  }

  /** Opt-out governance gate — the data-compliance filter an LLM corpus
    * pipeline must run BEFORE anything trains: pages carrying `noindex` or
    * the emerging `noai` robots directive are excluded
    * (keep_for_training = false), with the raw directive string and the
    * individual flags reported so removals are auditable per policy.
    * Unrelated directives (max-snippet etc.) must NOT trip the gate.
    * Map-side parse, zero shuffle — composes in front of the quality gates
    * as one more codegen-adjacent projection. */
  def optOutGate(docs: DataFrame): Dataset[RobotsGate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val html = HtmlGen.pageWithRobots(id, if (text == null) "" else text)
        val root = HtmlDom.parse(html)
        val raw = HtmlDom.find(root, e => e.tag == "meta" &&
            e.attr("name").exists(_.equalsIgnoreCase("robots")))
          .headOption.flatMap(_.attr("content")).getOrElse("")
        val dirs = raw.split(",").iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
        val noindex = dirs.contains("noindex")
        val nofollow = dirs.contains("nofollow")
        val noai = dirs.contains("noai")
        RobotsGate(id, raw, noindex, nofollow, noai, !(noindex || noai))
      })
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
