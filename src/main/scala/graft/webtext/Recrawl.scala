package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recrawl snapshot diffing — classify every document across two crawl
  * snapshots as added / removed / changed / unchanged (the CDX-style delta
  * that drives incremental curation: only `added`+`changed` re-enter the
  * pipeline, `removed` feeds tombstones to downstream indexes).
  *
  * Scale shape: each side is reduced to narrow (doc_id, content-key) rows
  * BEFORE the full-outer join — content-key = (xxhash64(text), length(text)),
  * the repo's standard 12-byte dedup key (CLAUDE.md) — so the join shuffles
  * ~20 bytes/doc instead of document payloads. The join itself is the
  * canonical co-partitioned sort-merge full outer on the primary key; at
  * 100 TB both snapshots arrive partitioned by doc_id (or url) and the
  * exchange is one narrow-key shuffle per side. The oracle compares text
  * equality directly; hash-vs-text classification diverges only on a 64-bit
  * collision at equal length — the same accepted tradeoff as `dedup_exact`.
  */
object Recrawl {

  /** Deterministic synthetic "next crawl" snapshot from `documents`:
    * docs with doc_id%7==3 are not re-crawled (removed); docs with
    * doc_id%5==1 are modified (text + " updated"); docs with doc_id%11==0
    * additionally yield a brand-new page at doc_id+1000000.
    */
  def snapshotB(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val recrawled = docs.filter(id % 7 =!= 3)
      .select(id,
        when(id % 5 === 1, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
    val fresh = docs.filter(id % 11 === 0)
      .select((id + 1000000L).as("doc_id"),
        concat(lit("recrawl new page "), id.cast("string")).as("text"))
    recrawled.unionByName(fresh)
  }

  /** SCD2 capture history — turn a capture log (k, version, t) into the
    * slowly-changing-dimension type-2 table every warehouse keeps for a
    * recrawled corpus: one row per version with its validity interval
    * [valid_from, valid_to) and an is_current flag (valid_to = -1 sentinel on
    * the open interval — table-grain rows never carry nulls into the
    * hash-compared surface). This is the batch materialization of what
    * [[graft.webtext.AsofJoin]] answers point-wise: an as-of lookup at time t
    * is exactly the row with valid_from <= t < valid_to.
    *
    * Scale shape: one hash shuffle on the key, then a single `lead(t)` window
    * pass per key — no self-join of captures against captures (the naive
    * interval build), and skew is bounded by the most-recrawled single url. */
  def scd2(snaps: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("t")
    snaps
      .withColumn("valid_to", coalesce(lead(col("t"), 1).over(w), lit(-1L)).cast("long"))
      .select(col("k"), col("version").cast("long").as("version"),
        col("t").cast("long").as("valid_from"), col("valid_to"),
        when(col("valid_to") === -1L, 1L).otherwise(0L).as("is_current"))
  }

  /** (doc_id, status) for every doc present in either snapshot. */
  def delta(a: DataFrame, b: DataFrame): DataFrame = {
    def keyed(df: DataFrame, h: String, l: String) =
      df.select(col("doc_id"), xxhash64(col("text")).as(h),
        length(col("text")).cast("long").as(l))
    val ka = keyed(a, "ha", "la")
    val kb = keyed(b, "hb", "lb")
    ka.join(kb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("ha").isNull, lit("added"))
          .when(col("hb").isNull, lit("removed"))
          .when(col("ha") === col("hb") && col("la") === col("lb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
