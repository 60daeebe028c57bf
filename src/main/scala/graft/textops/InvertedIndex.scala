package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed inverted-index build — the search-side consumer of a curated
  * corpus (phrase lookup, quotation tracing, duplicate-passage queries all
  * run off posting lists, and building them is a canonical corpus-scale
  * MapReduce). Terms here are adjacent-word BIGRAMS (a phrase index): with
  * the fixture corpus's tiny unigram vocabulary the bigram grain is what
  * exercises a realistic term distribution, and phrase postings are what
  * n-gram-overlap tooling (decontamination audits, quote mining) consumes.
  *
  * Per term: document frequency `df`, collection frequency `cf`, and a
  * posting string of the first `maxPostings` docs by doc_id as
  * "doc:tf,doc:tf,…" (impact-ordered truncation is the standard index-time
  * cap; doc_id order keeps it deterministic).
  *
  * Scale shape: explode to (term, doc_id) -> tf at (term, doc) grain with
  * map-side partials; `df`/`cf` are a second aggregation of that SAME
  * term-partitioned table (exchange reuse, no rescan of the corpus); the
  * posting cap is a row_number <= maxPostings filter that Spark 4 plans as
  * WindowGroupLimit, so stop-phrase terms ship at most cap×partitions rows
  * into the final agg instead of their full posting list. Term text is the
  * grouping key because it must appear in the output; at 100 TB the skew of
  * head terms splits under AQE and the group-limit bounds the heavy lists.
  */
object InvertedIndex {

  /** Build the bigram phrase index. Output: (term, df, cf, postings),
    * `df >= minDf` only, one row per surviving term. */
  def phraseIndex(docs: DataFrame, minDf: Long = 2L, maxPostings: Int = 20): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val bigrams = transform(sequence(lit(0), size(ws) - 2),
      i => concat(element_at(ws, i + 1), lit(" "), element_at(ws, i + 2)))
    val terms = docs.filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("term"))
    val tf = terms.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term").agg(count(lit(1)).as("df"), sum("tf").as("cf"))
    val top = tf
      .withColumn("r", row_number().over(Window.partitionBy("term").orderBy("doc_id")))
      .filter(col("r") <= maxPostings)
      .groupBy("term")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("tf").cast("string"))), ",").as("postings"))
    stats.join(top, Seq("term")).filter(col("df") >= minDf)
      .select("term", "df", "cf", "postings")
  }
}
