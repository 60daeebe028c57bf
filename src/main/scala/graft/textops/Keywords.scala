package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction — the doc-tagging/indexing stage of
  * a training-data pipeline (topic bucketing, dedup diagnostics, retrieval
  * keys), in integer fixed-point so the oracle recomputes it bit-for-bit.
  *
  * IDF is the truncated fixed-point surrogate `(N * scale) div df` (monotone
  * in the usual log(N/df) — ordering, which is all top-k needs, is
  * preserved within a document up to the truncation grain); score =
  * tf * idf. Top-`k` terms per doc, ties broken by term so the result is
  * total-ordered and deterministic.
  *
  * Scale shape: ONE map-side explode of the token stream; tf = partial-agg
  * rollup at (doc, term) grain; df is derived from tf — tf holds exactly one
  * row per (doc, term), so `tf.groupBy(term).count()` IS
  * `count_distinct(doc_id)` over the raw stream, and both join branches
  * share the same (doc_id, term) exchange subtree, which Spark's
  * ReuseExchange collapses to a single scan+explode+shuffle (pinned in
  * PlanSpec: one Generate in the executed plan). This deletes a second full
  * corpus explode AND a token-stream-sized count_distinct shuffle. tf ⋈ df
  * is a term-keyed shuffle join — NOT broadcast, because a web-scale
  * vocabulary (urls, typos, code) can be arbitrarily large even though it is
  * small per partition; the per-doc top-k window shuffles at doc grain.
  */
object Keywords {

  def tfidfTopK(docs: DataFrame, k: Int = 5, scale: Long = 4096L): DataFrame = {
    val n = docs.count()
    val terms = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // The tf >= 1 filter is vacuously true (count of a non-empty group) but
    // the optimizer cannot prove it, so the df branch must consume the tf
    // value — without it, column pruning rewrites the shared child into a
    // keys-only distinct aggregate, the two exchange subtrees stop
    // canonicalizing identically, and AQE cannot reuse the (doc_id, term)
    // shuffle stage (the corpus explode would physically run twice).
    val df = tf.where(col("tf") >= 1).groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .select(col("doc_id"), col("term"),
        (col("tf") * expr(s"(${n}L * ${scale}L) div df")).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("score"))
  }
}
