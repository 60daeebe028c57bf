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

  /** Per-doc duplicate-span statistics: `(doc_id, total_words, n_grams,
    * n_dup_grams, covered_words, dup_frac_bp)`. */
  def dupSpans(docs: DataFrame, n: Int = 20): DataFrame = {
    require(n >= 2, "n-gram order must be >= 2")
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("total_words", size(col("ws")).cast("long"))
    val pos = base.select(col("doc_id"),
        explode(expr(
          s"""CASE WHEN size(ws) >= $n
             |THEN transform(sequence(0, size(ws) - $n),
             |               i -> struct(i AS pos, xxhash64(array_join(slice(ws, i + 1, $n), ' ')) AS h))
             |ELSE CAST(array() AS array<struct<pos:int,h:bigint>>) END""".stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
    val dupKeys = pos.select("h", "doc_id").distinct()
      .groupBy("h").count().where(col("count") >= 2).select("h")
    val dupStarts = pos.join(dupKeys, Seq("h"), "left_semi")
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
}
