package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicate-substring detection at word-n-gram grain — the
  * exact-substring dedup stage (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better"): boilerplate legalese, syndicated wire
  * copy, and licence blocks repeat VERBATIM across documents that are not
  * near-duplicates as wholes, so doc-grain MinHash/SimHash never flags them.
  * This op marks, per document, how much of it is covered by word n-grams
  * that also appear in at least one OTHER document; the `dup_frac_bp` column
  * is the gate a curation pipeline thresholds on (or the span map a
  * substring-remover consumes).
  *
  * Plan (all builtins, whole-stage codegen until the shuffles):
  *   1. map-side: split → `transform(sequence, …)` builds (pos,
  *      xxhash64(gram)) structs — the gram TEXT never leaves the map stage,
  *      only 8-byte hashes with 4-byte positions;
  *   2. distinct (h, doc_id) → groupBy(h) count ≥ 2 = cross-document grams
  *      (within-doc repetition alone does not qualify — that's
  *      `repetition_stats`);
  *   3. left-semi join the position table against the duplicated keys
  *      (hash-grain shuffle, narrow rows);
  *   4. per-doc interval union WITHOUT exploding spans: sorted by start,
  *      union length = Σ min(next_start − start, n) (last term n) — one
  *      doc-grain window + an aggregation the optimizer feeds from the same
  *      exchange.
  * At 10^12 docs the gram-grain shuffles move ~words × 12 bytes — the
  * irreducible cost of exact substring matching distributed (a suffix array
  * is cheaper per byte but needs global order; the hash formulation is
  * embarrassingly partitionable and AQE-skew-splittable). 64-bit collision
  * tradeoff identical to dedup_exact's documented contract.
  */
object DupSpans {

  /** 26-word licence-boilerplate fixture appended to `doc_id % 3 == 0` docs
    * (FIXTURES.md family) — long enough to contain 26−n+1 shared n-grams. */
  val Disclaimer: String =
    "all rights reserved contents of this page may not be reproduced without " +
    "express written permission of the publisher and any unauthorized " +
    "distribution is strictly prohibited worldwide"

  def plantDisclaimer(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + Disclaimer)))
        .otherwise(col("text")).as("text"))

  /** `(doc_id, ws, total_words)` word-array lift shared by both span ops. */
  private def wordBase(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(col("text"), " ").as("ws"))
    .withColumn("total_words", size(col("ws")).cast("long"))

  /** Start positions of word n-grams shared with >= 1 OTHER document:
    * `(doc_id, pos)` — steps 1-3 of the class doc, shared by the
    * statistics ([[dupSpans]]) and excision ([[dupSpanRemoval]]) consumers. */
  private def dupStartPositions(base: DataFrame, n: Int): DataFrame = {
    val pos = base.select(col("doc_id"),
        explode(expr(
          s"""CASE WHEN size(ws) >= $n
             |THEN transform(sequence(0, size(ws) - $n),
             |               i -> struct(i AS pos, xxhash64(array_join(slice(ws, i + 1, $n), ' ')) AS h))
             |ELSE CAST(array() AS array<struct<pos:int,h:bigint>>) END""".stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
    val dupKeys = pos.select("h", "doc_id").distinct()
      .groupBy("h").count().where(col("count") >= 2).select("h")
    pos.join(dupKeys, Seq("h"), "left_semi").select("doc_id", "pos")
  }

  /** Per-doc duplicate-span statistics: `(doc_id, total_words, n_grams,
    * n_dup_grams, covered_words, dup_frac_bp)`. */
  def dupSpans(docs: DataFrame, n: Int = 20): DataFrame = {
    require(n >= 2, "n-gram order must be >= 2")
    val base = wordBase(docs)
    val dupStarts = dupStartPositions(base, n)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val cov = dupStarts
      .withColumn("gap", coalesce(lead("pos", 1).over(w) - col("pos"), lit(n)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(least(col("gap"), lit(n))).as("covered_words"))
    base.select("doc_id", "total_words")
      .join(cov, Seq("doc_id"), "left")
      .withColumn("n_grams", greatest(col("total_words") - (n - 1), lit(0L)))
      .withColumn("n_dup_grams", coalesce(col("n_dup_grams"), lit(0L)))
      .withColumn("covered_words", coalesce(col("covered_words"), lit(0L)))
      .withColumn("dup_frac_bp",
        expr("CASE WHEN total_words > 0 THEN (covered_words * 10000) div total_words ELSE 0L END"))
      .select("doc_id", "total_words", "n_grams", "n_dup_grams", "covered_words", "dup_frac_bp")
  }

  /** The EXCISION stage of exact-substring dedup (Lee et al. §4 "ExactSubstr"
    * policy: remove EVERY occurrence of a cross-document duplicate substring,
    * in every document that carries one — the symmetric policy the paper
    * trains on). [[dupSpans]] measures; this rewrites the corpus:
    * `(doc_id, total_words, removed_words, kept_words, clean_text)` where
    * `clean_text` is the original word stream with all merged duplicate
    * intervals cut out and the survivors re-joined on single spaces.
    *
    * Interval merge stays relational (the sorted-island window trick:
    * a start opens a new island iff it clears the running max end), and the
    * per-doc rebuild is ONE `aggregate()` lambda over the doc's own merged
    * interval list — O(words) per doc, no per-interval join back, no UDF.
    * The only data wider than 12-byte (doc,pos) pairs that crosses a shuffle
    * is the final doc-grain join of interval LISTS (couple of ints per
    * interval) against the word arrays — at 10^12 docs that join is
    * hash-partitioned on doc_id and both sides are pre-bucketable on it.
    */
  def dupSpanRemoval(docs: DataFrame, n: Int = 20): DataFrame = {
    require(n >= 2, "n-gram order must be >= 2")
    val base = wordBase(docs)
    val dupStarts = dupStartPositions(base, n)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    // island id = running count of starts that clear every earlier end
    val islands = dupStarts
      .withColumn("brk",
        (col("pos") > coalesce(max(col("pos") + n).over(wPrev), lit(-1))).cast("int"))
      .withColumn("isl", sum("brk").over(w))
    val iv = islands.groupBy("doc_id", "isl")
      .agg(min("pos").as("s"), (max(col("pos")) + n).as("e"))
    val perDoc = iv.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("ivs"),
        sum(col("e") - col("s")).cast("long").as("removed_words"))
    base.join(perDoc, Seq("doc_id"), "left")
      .withColumn("removed_words", coalesce(col("removed_words"), lit(0L)))
      .withColumn("kept_words", col("total_words") - col("removed_words"))
      .withColumn("clean_text", expr(
        """CASE WHEN ivs IS NULL THEN array_join(ws, ' ')
          |ELSE aggregate(ivs,
          |       struct(0 AS prev, CAST(array() AS array<array<string>>) AS parts),
          |       (acc, iv) -> struct(iv.e AS prev,
          |                           concat(acc.parts, array(slice(ws, acc.prev + 1, iv.s - acc.prev))) AS parts),
          |       acc -> array_join(
          |                flatten(concat(acc.parts,
          |                               array(slice(ws, acc.prev + 1, size(ws) - acc.prev)))), ' '))
          |END""".stripMargin))
      .select("doc_id", "total_words", "removed_words", "kept_words", "clean_text")
  }
}
