package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup-safe training-batch scheduling — contrastive training with in-batch
  * negatives silently breaks when a batch contains two copies of the same
  * content (the "negative" is the anchor's own duplicate: a false negative
  * that actively untrains the model). This op assigns every document a batch
  * such that NO two exact-duplicate documents ever share one, without a
  * global coordination step:
  *
  *   - wave  = row_number of the doc within its duplicate group (narrow
  *     `(xxhash64(text), length)` key, the dedup_exact rule — raw text never
  *     crosses the shuffle);
  *   - shard = FNV-1a("batch:" ⧺ doc_id) mod `shards` — a content-free,
  *     engine-independent hash split (the sampleMixture/prioritySample salt
  *     pattern), so wave-1 (≈ the whole corpus) spreads across `shards`
  *     batches with NO corpus-grain window;
  *   - batch = (wave − 1)·shards + shard.
  *
  * Validity is STRUCTURAL, not probabilistic: duplicates occupy distinct
  * waves (row_number within their group), and wave w's batches live in the
  * disjoint range [(w−1)·shards, w·shards) — so two copies can never
  * collide, for any corpus, any shards, any engine.
  *
  * Scale shape: one key-grain window over 16-byte keys (head-group skew is
  * the largest duplicate cluster — the same AQE-split story as dedup_exact),
  * then a map-side hash; nothing global. A 64-bit key collision can only
  * merge two texts into one group, which errs toward MORE separation —
  * never a validity violation. */
object BatchSchedule {

  /** Exact-twin plant: every doc gains a copy at doc_id + PlantOffset with
    * IDENTICAL text (the in-batch false-negative hazard made concrete). */
  def plantTwins(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.unionByName(docs.select(
      (col("doc_id") + Dedup.PlantOffset).as("doc_id"), col("text")))
  }

  /** (doc_id, wave, shard, batch) with the no-shared-batch guarantee. */
  def dedupSafeBatches(docs: DataFrame, shards: Int = 4): DataFrame = {
    require(shards >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("kh", "kl").orderBy("doc_id")
    docs.select(col("doc_id"),
        xxhash64(col("text")).as("kh"), length(col("text")).as("kl"))
      .withColumn("wave", row_number().over(w).cast("long"))
      .select("doc_id", "wave").as[(Long, Long)]
      .map { case (id, wave) =>
        val shard = java.lang.Long.remainderUnsigned(
          TextHash.fnv64(s"batch:$id"), shards.toLong)
        (id, wave, shard, (wave - 1L) * shards + shard)
      }
      .toDF("doc_id", "wave", "shard", "batch")
  }

  /** Variable-multiplicity plant: doc gains a copy at doc_id + r·PlantOffset
    * for each r in 1..3 with doc_id % 4 ≥ r — duplicate-group sizes 1..4 by
    * doc_id % 4, the skew the epoch scheduler has to price. */
  def plantCopies(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    (1 to 3).foldLeft(base) { (acc, r) =>
      acc.unionByName(docs.where(col("doc_id") % 4 >= r)
        .select((col("doc_id") + r * Dedup.PlantOffset).as("doc_id"), col("text")))
    }
  }

  /** Duplication-aware epoch scheduling — the data-constrained-training rule
    * (Muennighoff et al. 2023: repeated data buys less each epoch): instead
    * of dedup-then-repeat-everything-E-times, give each UNIQUE text a repeat
    * budget inversely proportional to its natural multiplicity, so content
    * the crawl already over-represents is not ALSO over-trained. Per
    * duplicate group (narrow `(xxhash64, length)` key — raw text never
    * crosses the shuffle): representative = min doc_id, dup_count = group
    * size, epochs = max(1, E div dup_count), and naive_passes =
    * dup_count · epochs — the pass count a no-dedup pipeline would have
    * spent, i.e. the audit column showing what the schedule saved.
    *
    * Scale shape: one key-grain hash aggregate (map-side combine on 16-byte
    * keys), then pure arithmetic; the head duplicate group is the same AQE
    * skew story as dedup_exact. */
  def epochSchedule(docs: DataFrame, epochBudget: Long = 4L): DataFrame = {
    require(epochBudget >= 1L)
    docs.select(col("doc_id"),
        xxhash64(col("text")).as("kh"), length(col("text")).as("kl"))
      .groupBy("kh", "kl")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select(col("doc_id"), col("dup_count"),
        greatest(lit(1L), expr(s"${epochBudget}L div dup_count")).as("epochs"))
      .withColumn("naive_passes", expr("dup_count * epochs"))
  }
}
