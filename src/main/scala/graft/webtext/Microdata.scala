package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset}

import pageplus.spark.Pipeline

/** HTML microdata (itemscope/itemprop) article mining — the attribute-level
  * twin of [[JsonLd]]: the same schema.org vocabulary, embedded on visible
  * elements instead of a script block. Publishers split roughly evenly
  * between the two, so a curation pipeline needs both extractors feeding one
  * metadata table.
  *
  * Scoping rules implemented (the part DOM-naive extractors get wrong):
  * an `itemprop` belongs to the NEAREST ancestor `itemscope` — so the
  * property walk descends the Article scope's subtree but does NOT cross
  * into nested scopes, except to read the nested scope itself as a property
  * value (an `itemprop` that is also an `itemscope` contributes its own
  * `name` property, the schema.org Person pattern). Property values: `meta`
  * elements read their `content` attribute, everything else its decoded
  * text. Non-Article scopes (breadcrumbs, site chrome) are skipped.
  *
  * Scale shape: map-side per-page parse + walk inside `mapPartitions`, zero
  * shuffles; emitted rows are tiny vs page bytes.
  */
object Microdata {

  final case class ArticleRow(url: String, headline: String, author: String,
                              word_count: Long)

  private val ArticleType = "https://schema.org/Article"

  /** All (prop, value) pairs belonging directly to `scope` (nearest-ancestor
    * rule: recursion stops at nested itemscopes, which contribute their
    * `name` as the value when they carry an itemprop themselves). */
  private[graft] def scopeProps(scope: HtmlDom.HElem): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    def value(e: HtmlDom.HElem): String =
      if (e.tag == "meta") e.attr("content").getOrElse("")
      else HtmlDom.textOf(e)
    def walk(e: HtmlDom.HElem): Unit =
      e.children.foreach {
        case el: HtmlDom.HElem =>
          val prop = el.attr("itemprop")
          val nested = el.attr("itemscope").isDefined
          (prop, nested) match {
            case (Some(p), true) =>
              // nested scope as a value: its own `name` property stands in
              val name = scopeProps(el).collectFirst { case ("name", v) => v }
              out += ((p, name.getOrElse("")))
            case (Some(p), false) =>
              out += ((p, value(el)))
              walk(el)
            case (None, true) => () // anonymous nested scope: not ours
            case (None, false) => walk(el)
          }
        case _ => ()
      }
    walk(scope)
    out.result()
  }

  /** pages -> one row per schema.org/Article microdata scope: headline,
    * author (plain-text or nested-Person shape), integer wordCount. Pages
    * with no Article scope yield no row; non-Article scopes are skipped. */
  def articles(pages: DataFrame, saltPartitions: Int = 0): Dataset[ArticleRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    Pipeline.saltByUrl(pages.select("url", "html"), saltPartitions)
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        val root = HtmlDom.parse(new String(html, java.nio.charset.StandardCharsets.UTF_8))
        HtmlDom.find(root, e =>
            e.attr("itemscope").isDefined && e.attr("itemtype").contains(ArticleType))
          .map { scope =>
            val props = scopeProps(scope).toMap
            val wc = props.get("wordCount").flatMap(_.toLongOption).getOrElse(0L)
            ArticleRow(url, props.getOrElse("headline", ""),
              props.getOrElse("author", ""), wc)
          }
      }
  }
}
