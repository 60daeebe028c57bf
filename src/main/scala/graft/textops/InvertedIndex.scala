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

  /** Posting-list delta-gap compression estimate — the index-planning twin
    * of [[phraseIndex]]: per term, the exact varbyte size of the delta-gap
    * encoded posting list (first doc_id stored as-is, then consecutive
    * doc_id gaps; a value `v` costs `max(1, ceil(bits(v)/7))` bytes — the
    * classic 7-bits-per-byte continuation code) against the 8-bytes-per-id
    * raw cost. At web scale this table IS the index capacity plan: gap
    * distributions decide shard sizes and whether head terms need skipping
    * structures (`max_gap` exposes the worst seek per list).
    *
    * Scale shape: one corpus explode to (term, doc_id) grain, then a
    * TERM-partitioned lag window (term-grain shuffle, the same key the index
    * build already uses; head-term skew splits under AQE) and a term-grain
    * sum — byte math is pure bit arithmetic (`length(bin(v))`, no floats).
    */
  def postingGaps(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val bigrams = transform(sequence(lit(0), size(ws) - 2),
      i => concat(element_at(ws, i + 1), lit(" "), element_at(ws, i + 2)))
    docs.filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("term"))
      .distinct()
      .withColumn("gap", col("doc_id") -
        lag("doc_id", 1).over(Window.partitionBy("term").orderBy("doc_id")))
      .withColumn("v", coalesce(col("gap"), col("doc_id")))
      .withColumn("bytes", when(col("v") === 0, lit(1L))
        .otherwise(expr("(length(bin(v)) + 6) div 7").cast("long")))
      .groupBy("term").agg(
        count(lit(1)).cast("long").as("df"),
        sum("bytes").as("index_bytes"),
        (count(lit(1)) * lit(8)).cast("long").as("raw_bytes"),
        max("gap").as("max_gap"))
  }
}
