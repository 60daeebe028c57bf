package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental index maintenance — the reindex delta a recrawl implies for a
  * live posting-list store: changed and removed documents tombstone their OLD
  * postings, changed and added documents upsert their NEW ones. Full rebuilds
  * at 10^12 docs are off the table; every production search/dedup index
  * consumes exactly this (doc, term) delta stream per crawl cycle.
  *
  * Composes the recrawl diff ([[graft.webtext.Recrawl.delta]] semantics,
  * recomputed here with texts attached) with [[InvertedIndex]]'s bigram term
  * grain. Output at term grain: how many docs upsert vs tombstone each term —
  * the index-shard write amplification report.
  *
  * Scale shape: the status classification is the narrow-key full-outer join
  * crawl_delta already uses (content keys, ~20 bytes/doc); only the
  * changed/added/removed MINORITY (status != unchanged — at real recrawl
  * cadence a few percent of the corpus) ever reaches the term explode, so the
  * expensive stage is delta-sized, not corpus-sized. Term aggregation is
  * (term, distinct doc) with map-side partials; the final upsert/tombstone
  * merge is a term-grain full-outer join.
  */
object IndexDelta {

  /** (term, n_upserts, n_tombstones) over bigram terms for the `oldDocs` ->
    * `newDocs` recrawl, terms with any activity only. Both inputs:
    * (doc_id, text). */
  def indexDelta(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def keyed(df: DataFrame, h: String, l: String, t: String) =
      df.select(col("doc_id"), xxhash64(col("text")).as(h),
        length(col("text")).cast("long").as(l), col("text").as(t))
    val j = keyed(oldDocs, "ha", "la", "ta")
      .join(keyed(newDocs, "hb", "lb", "tb"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("ha").isNull, lit("added"))
          .when(col("hb").isNull, lit("removed"))
          .when(col("ha") === col("hb") && col("la") === col("lb"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("status") =!= "unchanged")
    def terms(textCol: String) = {
      val ws = split(col(textCol), " ", -1)
      explode(array_distinct(transform(sequence(lit(0), size(ws) - 2),
        i => concat(element_at(ws, i + 1), lit(" "), element_at(ws, i + 2)))))
    }
    val tomb = j.filter(col("status").isin("removed", "changed"))
      .filter(size(split(col("ta"), " ", -1)) >= 2)
      .select(col("doc_id"), terms("ta").as("term"))
      .groupBy("term").agg(count(lit(1)).as("nt"))
    val up = j.filter(col("status").isin("added", "changed"))
      .filter(size(split(col("tb"), " ", -1)) >= 2)
      .select(col("doc_id"), terms("tb").as("term"))
      .groupBy("term").agg(count(lit(1)).as("nu"))
    up.join(tomb, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("nu"), lit(0L)).as("n_upserts"),
        coalesce(col("nt"), lit(0L)).as("n_tombstones"))
  }
}
