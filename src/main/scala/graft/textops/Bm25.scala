package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 top-k retrieval — the ranking stage a curated corpus feeds (eval-set
  * retrieval baselines, RAG context selection, dedup diagnostics by "what
  * else ranks for this doc's head terms"). The reference has no retrieval op;
  * this belongs to the search-side consumers of the web-scale tier, next to
  * [[InvertedIndex]] (which materializes the postings this query ranks over)
  * and [[Keywords]] (whose tf-idf is BM25's unsaturated ancestor).
  *
  * Arithmetic contract (integer-exact so the DuckDB oracle recomputes every
  * score bit-for-bit, the CLAUDE.md approximate-op rule):
  *   - idf: the float `log(N/df)` is replaced by the repo's established
  *     bit-length surrogate (dsir_weights, entropy_quality):
  *     `idf_bits = length(bin(N div df))` = floor(log2(N/df)) + 1 — monotone
  *     in the real idf, and ≤ 64 for any corpus, which keeps every later
  *     product in long range at 10^12 docs;
  *   - length normalization in 4096 fixed-point with k1 = 1.2, b = 0.75
  *     carried as milli-units (1200, 750):
  *       avgdl      = A div N                     (corpus constant, A = Σ dl)
  *       dl_rel_fp  = (dl * 4096) div avgdl
  *       k_fp       = (1200 * (250 * 4096 + 750 * dl_rel_fp)) div 1000000
  *                                                 ≈ k1·(1−b+b·dl/avgdl)·4096
  *       denom_fp   = tf * 4096 + k_fp
  *       contrib    = (idf_bits * tf * 2200 * 4096) div (denom_fp * 1000)
  *                                                 ≈ idf·tf·(k1+1)/(tf+K)
  *     score = Σ_t contrib — every division is a single trunc `div` on
  *     non-negative longs, mirrored verbatim by the oracle. Overflow bound:
  *     idf_bits ≤ 64, so contrib's numerator stays < 2^63 while
  *     tf < 1.5·10^13 — no real document repeats a term that often.
  *
  * The query workload is derived from the corpus itself (no constants to
  * re-pin per sf): query q ∈ 0..4 is the distinct first-3-word prefix of
  * document 7q+3 — exactly what an SQL oracle can re-derive.
  *
  * Scale shape: ONE explode of the corpus into (doc, term) tf partials; df
  * AND dl are both second aggregations of that same tf table (the Keywords
  * df-from-tf move — dl = Σ tf per doc because tf holds every token), so the
  * corpus is scanned once and the (doc_id, term) exchange is reused; N and A
  * are a 1-row aggregate broadcast by crossJoin; the ≤15-row query-term table
  * broadcast-joins the postings so only matching postings survive to the
  * (q_id, doc) rollup; top-k plans as WindowGroupLimit (partitions pre-prune
  * to k before the q_id shuffle). Nothing in the plan holds state larger
  * than the match set for the query batch.
  */
object Bm25 {

  /** Rank the corpus for the 5 corpus-derived queries. Output one row per
    * (q_id, rnk ≤ k): (q_id, rnk, doc_id, score). */
  def topK(docs: DataFrame, k: Int = 10): DataFrame = {
    // The null guards are semantically vacuous (the fixture has no null ids
    // or texts) but structurally load-bearing: the four consumers of tf
    // (direct join, df, dl, totals) each make the optimizer push a DIFFERENT
    // isnotnull set toward the scan (doc_id for the dl join, term for the
    // query join, none for totals). Planting every guard on the shared
    // subtree itself means push-down finds the predicates already present,
    // all four children canonicalize identically, and AQE reuses ONE corpus
    // explode + (doc_id, term) exchange (pinned in PlanSpec).
    val terms = docs
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("term"))
      .where(col("term").isNotNull)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df/dl derived from tf: same exchange subtree, corpus exploded once.
    // The vacuous tf >= 1 consumption keeps both children canonicalizing
    // identically so AQE reuses the shuffle stage (see Keywords.tfidfTopK).
    val df = tf.where(col("tf") >= 1).groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.where(col("tf") >= 1).groupBy("doc_id").agg(sum("tf").as("dl"))
    val totals = dl.agg(count(lit(1)).as("n"), sum("dl").as("a"))
    val queries = docs
      .filter(col("doc_id") % 7 === 3 && col("doc_id") <= 31)
      .select(((col("doc_id") - 3) / 7).cast("long").as("q_id"),
        explode(slice(split(lower(col("text")), " ", -1), 1, 3)).as("term"))
      .distinct()
    val scored = tf
      .join(df, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .join(broadcast(queries), "term")
      .withColumn("avgdl", expr("a div n"))
      .withColumn("idf_bits", length(bin(expr("n div df"))))
      .withColumn("k_fp",
        expr("(1200L * (250L * 4096L + 750L * ((dl * 4096L) div avgdl))) div 1000000L"))
      .withColumn("contrib",
        expr("(idf_bits * tf * 2200L * 4096L) div ((tf * 4096L + k_fp) * 1000L)"))
      .groupBy("q_id", "doc_id").agg(sum("contrib").as("score"))
    val w = Window.partitionBy("q_id").orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "doc_id", "score")
  }
}
