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

  /** Deterministic capture log richer than [[graft.webtext.AsofJoin.plantSnapshots]]
    * for interval ESTIMATION: doc_id%5+1 captures per url spaced by a
    * per-url gap of 3600*(doc_id%41+1) seconds (1h..41h), so the estimator
    * sees the full clamp range (below min, inside, above max) plus the
    * never-changed (single-capture) class.
    */
  def plantCaptures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("k"),
        explode(sequence(lit(0L), col("doc_id") % 5)).as("version"))
      .select(col("k"), col("version"),
        (lit(1704067200L) + col("version") * lit(3600L) * (col("k") % 41 + 1L) +
          (col("k") % 97) * 60L).as("t"))

  /** Adaptive recrawl scheduling from a capture log (k, version, t) — the
    * Cho/Garcia-Molina freshness move: the observed mean change interval
    * (span // changes, trunc division) clamped to [minInterval, maxInterval]
    * becomes the url's next-fetch spacing; urls never seen changing get
    * maxInterval and an 'unseen' tier so the frontier can treat "no signal"
    * differently from "measured slow". Tiers are integer thresholds on the
    * estimate (hot <= 4*min, warm < max, cold = clamped at max).
    *
    * Scale shape: one map-side-combinable hash aggregation over narrow
    * (k, t) rows — count/min/max partials are 24 bytes per url per task, so
    * a 10^12-capture log reduces in one shuffle on the url key; everything
    * after the agg is per-row arithmetic in whole-stage codegen. */
  def recrawlIntervals(snaps: DataFrame, minInterval: Long = 7200L,
                       maxInterval: Long = 86400L): DataFrame = {
    require(minInterval >= 1L && maxInterval >= minInterval)
    val hotCap = 4L * minInterval
    snaps.groupBy(col("k"))
      .agg(count(lit(1)).as("captures"), min("t").as("first_t"), max("t").as("last_t"))
      .withColumn("changes", col("captures") - 1L)
      .withColumn("est_interval_s",
        when(col("changes") === 0L, lit(maxInterval))
          .otherwise(least(greatest(
            expr("(last_t - first_t) DIV changes"), lit(minInterval)), lit(maxInterval))))
      .select(col("k"), col("captures"), col("changes"), col("est_interval_s"),
        (col("last_t") + col("est_interval_s")).as("next_fetch"),
        when(col("changes") === 0L, lit("unseen"))
          .when(col("est_interval_s") <= hotCap, lit("hot"))
          .when(col("est_interval_s") < maxInterval, lit("warm"))
          .otherwise(lit("cold")).as("tier"))
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
