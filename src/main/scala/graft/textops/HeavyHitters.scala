package graft.textops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded key stream via the two-pass
  * lossy-counting pattern (Manku–Motwani, VLDB 2002): the curation use is
  * corpus-wide boilerplate discovery — bigrams whose share exceeds a
  * threshold are template/navigation debris (the C4 "frequent line" family
  * at n-gram grain), and the same primitive audits join-key skew before a
  * shuffle is sized.
  *
  * Why two passes instead of `groupBy(term).count()`: at 10^12 documents the
  * term stream has ~10^11 distinct keys, so a direct term-grain aggregation
  * shuffles the whole stream to count keys that are almost all below
  * threshold. Here pass 1 is map-side only — each partition runs a lossy
  * counter with error eps = thr/2 (bounded state: at most 1/eps = 2·den/num
  * table entries, ~400 at the default 0.5%) and emits just its surviving
  * keys, so NOTHING term-grain crosses the wire except ≤ P/eps candidate
  * rows. Pass 2 re-scans the corpus, keeps only rows matching the broadcast
  * candidate set, and counts those exactly — the shuffle carries only
  * candidate-matching rows (share ≥ ~eps each, so ≤ 1/eps distinct keys).
  *
  * Determinism: the CANDIDATE SET depends on partitioning (each partition's
  * eviction schedule differs), but the RESULT does not — lossy counting
  * guarantees any key with local frequency > eps·n_p survives partition p's
  * table, and pigeonhole gives every global heavy hitter (cnt ≥ thr·N) a
  * partition where its local share ≥ thr > eps; so the candidate set is
  * always a superset of the true heavy hitters, and the exact-count filter
  * `cnt·den ≥ num·N` (integer rational, CLAUDE.md dedup-threshold rule)
  * makes the output partition-invariant. The DuckDB oracle is therefore a
  * plain GROUP BY + HAVING — no sketch recompute needed (contrast cms_freq,
  * where the sketch itself is the result).
  */
object HeavyHitters {

  /** Pass-1 lossy counter over one partition: classic (f, Δ) table stored as
    * the upper bound ub = f + Δ; insert with ub = current bucket, evict
    * ub < bucket at each 1/eps-row bucket boundary. Emits a `null`-keyed
    * sentinel carrying the partition's row count (so the global N needs no
    * third corpus pass) followed by every surviving key. */
  private[graft] def lossyCandidates(it: Iterator[String], bucketW: Int)
  : Iterator[(String, Long)] = {
    require(bucketW >= 1)
    val ub = mutable.HashMap.empty[String, Long]
    var n = 0L
    var bucket = 1L
    while (it.hasNext) {
      val t = it.next()
      n += 1
      ub.updateWith(t) {
        case Some(u) => Some(u + 1)
        case None    => Some(bucket)
      }
      if (n % bucketW == 0) {
        bucket += 1
        ub.filterInPlace((_, u) => u >= bucket)
      }
    }
    Iterator.single((null: String, n)) ++ ub.keysIterator.map((_, 0L))
  }

  /** Exact heavy hitters of `terms`: every key with cnt·thrDen ≥ thrNum·N
    * (share ≥ thrNum/thrDen of the N-row stream), with its exact count and
    * integer share in basis points. Two corpus passes, zero term-grain
    * shuffle of non-candidates (see object doc). */
  def heavyHitters(terms: Dataset[String], thrNum: Long = 1L, thrDen: Long = 200L)
  : DataFrame = {
    require(thrNum > 0 && thrDen > thrNum, "threshold must be in (0, 1)")
    val spark = terms.sparkSession
    import spark.implicits._
    // eps = thr/2 -> bucket width 2*den/num rows; Int is ample (den <= 2^30).
    val bucketW = math.toIntExact(2L * thrDen / thrNum)
    val pass1 = terms.mapPartitions(it => lossyCandidates(it, bucketW))
      .toDF("term", "n")
      .cache() // tiny: <= numPartitions * (1/eps + 1) rows; feeds two consumers
    val total = pass1.filter(col("term").isNull).agg(sum("n").as("n"))
    val cands = pass1.filter(col("term").isNotNull).select("term").distinct()
    terms.toDF("term")
      .join(broadcast(cands), "term") // map-side candidate filter, no full shuffle
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total)) // 1-row global N
      .filter(col("cnt") * lit(thrDen) >= lit(thrNum) * col("n"))
      .select(col("term"), col("cnt"), expr("cnt * 10000L div n").as("share_bp"))
  }

  /** The corpus bigram stream used by the heavy-hitter query — identical
    * grain and planted-boilerplate shape to cms_freq (Dedup.plantBoilerplate)
    * so the discovered hitters are exactly the planted template bigrams plus
    * whatever the synthetic text genuinely repeats. */
  def bigramTerms(docs: DataFrame): Dataset[String] = {
    val planted = Dedup.plantBoilerplate(docs)
    val ws = split(col("text"), " ", -1)
    val bigrams = transform(sequence(lit(0), size(ws) - 2),
      i => concat(element_at(ws, i + 1), lit(" "), element_at(ws, i + 2)))
    planted.filter(size(ws) >= 2).select(explode(bigrams).as("term"))
      .select(col("term")).as(Encoders.STRING)
  }
}
