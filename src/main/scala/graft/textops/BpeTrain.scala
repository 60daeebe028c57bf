package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BPE tokenizer training — learn the top merge rules from the corpus, the
  * way production tokenizer trainers actually do it at scale: ONE corpus-
  * grain pass builds the (word, frequency) vocabulary table, then every merge
  * round runs at VOCABULARY grain (~10^7 rows at web scale, orders of
  * magnitude below the corpus), so the expensive data is touched exactly
  * once. Each round: adjacent-pair counts weighted by word frequency (every
  * adjacent position counts — standard BPE), argmax merge with deterministic
  * (count DESC, left ASC, right ASC) tie-breaking, then a greedy-left fold
  * re-tokenizes the vocab (a merged token cannot re-merge with its right
  * neighbor in the same round).
  *
  * The per-round argmax is a 1-row driver collect (the Lloyd-iteration
  * precedent); rounds are a fixed small count. State between rounds is the
  * re-tokenized vocab Dataset, cached per round with the predecessor
  * unpersisted — vocabulary-sized, never corpus-sized.
  *
  * Semantics shared verbatim with `tools/bpe_oracle_check.py`, the
  * independent recompute that derives the pinned oracle (iterative
  * argmax-dependent state is not one SQL statement — the geometry-oracle
  * precedent: pin the independently derived result, document the harness).
  */
object BpeTrain {

  /** Greedy-left application of merge (a, b) to a token list. */
  def foldMerge(tokens: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var t = tokens
    while (t.nonEmpty) {
      t match {
        case x :: y :: rest if x == a && y == b =>
          out += (a + b); t = rest
        case x :: rest =>
          out += x; t = rest
      }
    }
    out.result()
  }

  /** Learn `rounds` merges. Output: (rank, left_tok, right_tok, freq). */
  def train(docs: DataFrame, rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 64)
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq = docs.select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
    var vocab: Dataset[(List[String], Long)] =
      wordFreq.map { case (w, f) => (w.toList.map(_.toString), f) }.cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = vocab.flatMap { case (toks, f) =>
        toks.iterator.zip(toks.iterator.drop(1)).map { case (a, b) => (a, b, f) }
      }.toDF("a", "b", "f").groupBy("a", "b").agg(sum("f").as("cnt"))
      val top = counts.orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, c))
        val prev = vocab
        vocab = vocab.map { case (toks, f) => (foldMerge(toks, a, b), f) }.cache()
        vocab.count() // pin before dropping the predecessor
        prev.unpersist()
      }
    }
    merges.result().toDF("rank", "left_tok", "right_tok", "freq")
      .select(col("rank").cast("long").as("rank"), col("left_tok"),
        col("right_tok"), col("freq"))
  }
}
