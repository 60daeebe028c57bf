package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-growth (Heaps' law) corpus audit — cumulative distinct unigram
  * and bigram vocabulary plus cumulative token mass at power-of-two document
  * checkpoints. The curve answers the question every corpus increment raises:
  * is new data still contributing novel language, or has the crawl saturated
  * its sources (the bigram curve flattening is the earliest saturation
  * signal; for this synthetic corpus unigrams saturate by cp=8 while bigrams
  * keep growing to ~916)?
  *
  * Scale shape: the corpus-grain work is ONE first-occurrence aggregation per
  * gram order (`min(doc_id)` per term — term-grain shuffle keys, map-side
  * partial min), after which everything is checkpoint-grain (<= 63 rows):
  * each term buckets to its first visible checkpoint with pure bit arithmetic
  * (`smallest power of two > first_doc`, via `length(bin(fd))` — no floats),
  * and the cumulative curve is a window sum over the tiny checkpoint table.
  * No term ever joins against the checkpoint list row-by-row. Checkpoints
  * derive from `max(doc_id) + 1` (a column-pruned scan); a production
  * pipeline would pass the corpus size in, sparing that pass.
  */
object VocabGrowth {

  /** `(docs_seen, vocab_size, bigram_vocab, token_count, new_terms,
    * new_bigrams)` at checkpoints `{2^p < N} ∪ {N}`, `N = max(doc_id) + 1`;
    * a term/token at doc d counts toward checkpoints with `d < cp`. */
  def growth(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
    val n = docs.agg((max(col("doc_id")) + lit(1L)).as("n"))

    val cps = n
      .select(col("n"), explode(sequence(lit(0), lit(62))).as("p"))
      .select(col("n"), expr("shiftleft(cast(1 as bigint), p)").as("cp"))
      .where(col("cp") < col("n"))
      .select(col("cp"))
      .unionByName(n.select(col("n").as("cp")))
      .distinct()

    // first visible checkpoint for a first-occurrence doc id `fd`:
    // least(smallest power of two > fd, N) — exact bit arithmetic
    val bucket =
      "least(CASE WHEN fd = 0 THEN cast(1 as bigint) " +
        "ELSE shiftleft(cast(1 as bigint), length(bin(fd))) END, n) AS cp"

    def newPerCp(terms: DataFrame, out: String): DataFrame =
      terms.groupBy("term").agg(min("doc_id").as("fd"))
        .crossJoin(broadcast(n))
        .selectExpr(bucket)
        .groupBy("cp").agg(count(lit(1)).as(out))

    val uni = base.select(col("doc_id"), explode(col("ws")).as("term"))
    val big = base.select(col("doc_id"),
      explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), (w, i) -> concat(w, ' ', ws[i + 1]))"))
        .as("term"))

    val toks = base
      .select(col("doc_id").as("fd"), size(col("ws")).cast("long").as("tc"))
      .crossJoin(broadcast(n))
      .selectExpr(bucket, "tc")
      .groupBy("cp").agg(sum("tc").as("tok_new"))

    // checkpoint-grain from here on (<= 63 rows; the unpartitioned window is
    // deliberate and bounded, unlike the corpus-grain windows SCALE.md bans)
    val w = Window.orderBy("cp").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cps
      .join(newPerCp(uni, "nt"), Seq("cp"), "left")
      .join(newPerCp(big, "nb"), Seq("cp"), "left")
      .join(toks, Seq("cp"), "left")
      .select(col("cp"),
        coalesce(col("nt"), lit(0L)).as("new_terms"),
        coalesce(col("nb"), lit(0L)).as("new_bigrams"),
        coalesce(col("tok_new"), lit(0L)).as("tok_new"))
      .select(col("cp").as("docs_seen"),
        sum("new_terms").over(w).as("vocab_size"),
        sum("new_bigrams").over(w).as("bigram_vocab"),
        sum("tok_new").over(w).as("token_count"),
        col("new_terms"), col("new_bigrams"))
  }
}
