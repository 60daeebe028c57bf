package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extraction-quality evaluation — word-multiset precision/recall/F1 of an
  * extractor's output against gold text, the regression harness every
  * production extraction pipeline runs before a config change reprocesses
  * 10^12 pages (trafilatura/boilerpipe publish exactly this metric). The
  * multiset grain (count words WITH multiplicity, score the overlap) is the
  * standard: dropping one of two identical paragraphs must cost recall.
  *
  * All scores are integer basis points with trunc division (the repo's
  * fixed-point contract) — F1 is computed FROM the bp-rounded P and R so the
  * oracle needs no float at any step.
  *
  * Scale shape: both sides explode to (doc_id, xxhash64(word)) and aggregate
  * counts on that narrow 16-byte key (map-side partials); the per-doc overlap
  * is a full-outer join co-partitioned on the same key, then one doc-grain
  * rollup. Word text never crosses a shuffle; a 64-bit within-doc hash
  * collision (the dedup_exact tradeoff) merges two words' counts — P and R
  * move by at most that word's multiplicity.
  */
object ExtractionEval {

  /** The precision pollutant the degraded extractor appends. */
  val Promo = "subscribe to our newsletter for daily updates"

  /** Deterministic degraded-extractor fixture: doc_id%4==0 loses its first
    * 24-word paragraph (recall damage), doc_id%3==0 gains the promo line
    * (precision damage); both classes overlap so every P/R quadrant is
    * populated. Output: (doc_id, gold, extracted). */
  def plantDegraded(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val dropped = when(col("doc_id") % 4 === 0, slice(ws, lit(25), size(ws))).otherwise(ws)
    val appended = when(col("doc_id") % 3 === 0,
      concat(dropped, split(lit(Promo), " ", -1))).otherwise(dropped)
    docs.select(col("doc_id"), col("text").as("gold"),
      array_join(appended, " ").as("extracted"))
  }

  /** Per-document word-multiset P/R/F1 of `extracted` vs `gold` (both string
    * columns on `docs`). Empty extraction scores precision 0 by convention. */
  def prf(docs: DataFrame): DataFrame = {
    def counts(c: String, out: String) =
      docs.select(col("doc_id"), explode(split(col(c), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("doc_id"), xxhash64(col("w")).as("wk"))
        .agg(count(lit(1)).as(out))
    val j = counts("gold", "cg").join(counts("extracted", "ce"),
        Seq("doc_id", "wk"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("cg"), lit(0L)).as("cg"), coalesce(col("ce"), lit(0L)).as("ce"))
    val m = j.groupBy("doc_id").agg(
      sum(least(col("cg"), col("ce"))).as("inter"),
      sum("cg").as("ng"), sum("ce").as("ne"))
    // trunc division via SQL `div` (the HostRank fixed-point idiom): all
    // values non-negative, so Spark `div` == DuckDB `//` exactly
    val p = when(col("ne") > 0, expr("(inter * 10000L) div ne")).otherwise(0L)
    val r = expr("(inter * 10000L) div ng")
    m.select(col("doc_id"), col("ng").as("n_gold"), col("ne").as("n_extracted"),
        col("inter").as("n_match"), p.as("precision_bp"), r.as("recall_bp"))
      .withColumn("f1_bp",
        when(col("precision_bp") + col("recall_bp") > 0,
          expr("(2L * precision_bp * recall_bp) div (precision_bp + recall_bp)"))
          .otherwise(0L))
  }

  /** Version-drift gate — the diff report a release pipeline thresholds on
    * BEFORE letting a new extractor config reprocess 10^12 pages: per-doc
    * byte-identity flag, char delta, and word-multiset added/dropped masses
    * between the incumbent extraction (`gold`) and the candidate
    * (`extracted`). [[prf]] scores the candidate against gold truth; this
    * reports WHAT changed and how much, which is what the gate reads when no
    * gold exists (most of the corpus) — a changed-doc share or added-mass
    * spike blocks the rollout.
    *
    * Same scale shape as [[prf]]: word text never crosses a shuffle — both
    * sides explode to (doc_id, xxhash64(word)) counts with map-side
    * partials, one co-partitioned full-outer join, one doc-grain rollup;
    * the byte-identity flag is a map-side string compare fused into the
    * scan projection. */
  def driftReport(docs: DataFrame): DataFrame = {
    def counts(c: String, out: String) =
      docs.select(col("doc_id"), explode(split(col(c), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("doc_id"), xxhash64(col("w")).as("wk"))
        .agg(count(lit(1)).as(out))
    val flags = docs.select(col("doc_id"),
      when(col("gold") === col("extracted"), 1L).otherwise(0L).as("identical"),
      (length(col("extracted")).cast("long") - length(col("gold")).cast("long"))
        .as("char_delta"))
    val d = counts("gold", "cg").join(counts("extracted", "ce"),
        Seq("doc_id", "wk"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("cg"), lit(0L)).as("cg"), coalesce(col("ce"), lit(0L)).as("ce"))
      .groupBy("doc_id").agg(
        sum(greatest(col("ce") - col("cg"), lit(0L))).as("added_words"),
        sum(greatest(col("cg") - col("ce"), lit(0L))).as("dropped_words"))
    flags.join(d, Seq("doc_id"))
      .select(col("doc_id"), col("identical"), col("char_delta"),
        col("added_words"), col("dropped_words"))
  }
}
