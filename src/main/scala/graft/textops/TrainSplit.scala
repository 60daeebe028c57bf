package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-proof train/test splitting — a random split of a corpus with
  * duplicates puts copies of the same text on BOTH sides, and the test set
  * silently measures memorization (the eval-contamination failure
  * `Curate.contamination*` guards against, created here at split time
  * instead of ingested). The fix is group-consistent assignment:
  *
  *   - raw_split = FNV-1a("split:" ⧺ doc_id) mod 100 < testPct — the
  *     content-free, engine/cluster-size-independent hash draw (the
  *     sampleMixture salt pattern), reproducible from the doc identity
  *     alone;
  *   - split     = min(raw_split) over the doc's exact-duplicate group
  *     (narrow `(xxhash64, length)` key) — one train-side copy drags the
  *     whole group to train (0), because a duplicate group that ever
  *     touches train can never be test;
  *   - moved     = raw_split ≠ split, the audit bit: how much leakage the
  *     raw draw WOULD have caused.
  *
  * The invariant is structural: after the group-min collapse, two docs with
  * identical text always carry the same split, for any corpus and any
  * testPct — so cross-split exact leakage is impossible by construction.
  *
  * Scale shape: one key-grain window over 16-byte keys (head group = the
  * dedup_exact AQE skew story), map-side FNV; raw text never crosses the
  * shuffle, nothing global. */
object TrainSplit {

  /** (doc_id, raw_split, split, moved) with split ∈ {0=train, 1=test} and
    * the no-cross-split-duplicates guarantee. */
  def splitLeakproof(docs: DataFrame, testPct: Int = 10): DataFrame = {
    require(testPct >= 0 && testPct <= 100)
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("doc_id"),
        xxhash64(col("text")).as("kh"), length(col("text")).as("kl"))
      .as[(Long, Long, Long)]
      .map { case (id, kh, kl) =>
        val raw = if (java.lang.Long.remainderUnsigned(
          TextHash.fnv64(s"split:$id"), 100L) < testPct) 1L else 0L
        (id, kh, kl, raw)
      }
      .toDF("doc_id", "kh", "kl", "raw_split")
    keyed
      .withColumn("split", min("raw_split").over(Window.partitionBy("kh", "kl")))
      .select(col("doc_id"), col("raw_split"), col("split"),
        when(col("raw_split") =!= col("split"), 1L).otherwise(0L).as("moved"))
  }
}
