package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import pageplus.spark.Pipeline

/** Translation-family mining from `hreflang` alternate declarations — the
  * multilingual-corpus stage of a web pipeline: pages that declare each other
  * as language variants (`<link rel="alternate" hreflang=... href=...>`) form
  * a translation family, the unit for parallel-corpus extraction, per-language
  * dedup (keep one variant per family per language), and cross-lingual
  * document pairing (feeds [[graft.textops.Bitext]]).
  *
  * Scale shape: the parse is a map-side document-grain flatMap fused with the
  * family reduction — each page carries its OWN full alternate set, so the
  * family key (min href) is computed inside the row with zero shuffle. The
  * only shuffles are the `(cluster, hreflang, href)` distinct (family-grain,
  * tiny rows; pages of one family emit identical rows so distinct also
  * collapses the per-variant re-declarations a real crawl would contain) and
  * the family-grain language count. Nothing is corpus-sized after the first
  * flatMap.
  */
object Hreflang {

  final case class AltRow(url: String, hreflang: String, href: String)

  /** pages -> one row per declared alternate: (url, hreflang, href).
    * Malformed declarations (missing href or hreflang) are skipped;
    * `x-default` IS emitted here (callers that want routing hints keep it;
    * [[clusters]] filters it out). Map-side, zero shuffle. */
  def alternates(pages: DataFrame, saltPartitions: Int = 0): Dataset[AltRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    Pipeline.saltByUrl(pages.select("url", "html"), saltPartitions)
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        parseAlternates(new String(html, java.nio.charset.StandardCharsets.UTF_8))
          .map { case (l, h) => AltRow(url, l, h) }
      }
  }

  /** All well-formed `rel=alternate hreflang` links of a page, document order. */
  private[graft] def parseAlternates(html: String): Seq[(String, String)] = {
    val root = HtmlDom.parse(html)
    HtmlDom.find(root, e => e.tag == "link" &&
        e.attr("rel").contains("alternate") && e.attr("hreflang").isDefined)
      .flatMap { e =>
        (e.attr("hreflang"), e.attr("href")) match {
          case (Some(l), Some(h)) if l.nonEmpty && h.nonEmpty => Some((l, h))
          case _ => None
        }
      }
  }

  /** pages -> translation-family rows `(cluster, hreflang, href, n_langs)`:
    * cluster = lexicographic min href over the page's REAL alternates
    * (`x-default` is a routing hint, not a language — excluded from both the
    * key and the rows), n_langs = distinct languages in the family. The
    * family key is computed inside the per-page flatMap (each page declares
    * its whole family), so the distinct + count shuffles move only
    * family-grain rows. */
  def clusters(pages: DataFrame, saltPartitions: Int = 0): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val rows = Pipeline.saltByUrl(pages.select("url", "html"), saltPartitions)
      .as[(String, Array[Byte])]
      .flatMap { case (_, html) =>
        val alts = parseAlternates(new String(html, java.nio.charset.StandardCharsets.UTF_8))
          .filter(_._1 != "x-default")
        if (alts.isEmpty) Iterator.empty
        else {
          val cluster = alts.iterator.map(_._2).min
          alts.iterator.map { case (l, h) => (cluster, l, h) }
        }
      }
      .toDF("cluster", "hreflang", "href")
      .distinct()
    // n_langs = DISTINCT languages (a family may declare several regional
    // hrefs per language in the wild); collect_set over the cluster window
    // reuses the family-grain partitioning, no second aggregation pass
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
    rows.withColumn("n_langs", size(collect_set(col("hreflang")).over(w)).cast("long"))
  }
}
