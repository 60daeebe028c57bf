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
  * Scale shape: one map-side explode of the token stream; tf = partial-agg
  * rollup at (doc, term) grain; df = partial-agg rollup at term grain
  * (vocabulary ≪ token stream after map-side combine); tf ⋈ df is a
  * term-keyed shuffle join — NOT broadcast, because a web-scale vocabulary
  * (urls, typos, code) can be arbitrarily large even though it is small per
  * partition; the per-doc top-k window shuffles at doc grain. Three
  * aggregation-grain shuffles, none corpus-quadratic.
  */
object Keywords {

  def tfidfTopK(docs: DataFrame, k: Int = 5, scale: Long = 4096L): DataFrame = {
    val n = docs.count()
    val terms = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
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
