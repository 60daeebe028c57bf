package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL template mining — collapse digit runs in paths to `{n}` and count per
  * (host, template): the crawler-side structure report that separates article
  * pages from calendar traps, pagination loops, and session-id explosions
  * before they eat the fetch budget. (Real frontier schedulers cap fetches
  * per template for exactly this reason; the mined table is that cap's key.)
  *
  * Scale shape: the digit-run rewrite is a map-side `regexp_replace`; the
  * count is a (host, template) hash aggregate with map-side partials —
  * template cardinality is site-structure-sized, orders of magnitude below
  * the url count, so the shuffled table is tiny.
  */
object UrlTemplates {

  /** Deterministic frontier fixture: every doc contributes its sitemap
    * article url and its redirect-chain url — two path families per host. */
  def plantFrontierUrls(docs: DataFrame): DataFrame = {
    val h = concat(lit("site"), (col("doc_id") % 7).cast("string"), lit(".example.com"))
    docs.select(h.as("host"),
        concat(lit("/articles/doc"), col("doc_id").cast("string"), lit(".html")).as("path"))
      .unionByName(docs.select(h.as("host"),
        concat(lit("/r/"), col("doc_id").cast("string")).as("path")))
  }

  /** (host, template, n_urls) with digit runs collapsed to `{n}`. */
  def templates(urls: DataFrame): DataFrame =
    urls.select(col("host"),
        regexp_replace(col("path"), "[0-9]+", "{n}").as("template"))
      .groupBy("host", "template").agg(count(lit(1)).as("n_urls"))
}
