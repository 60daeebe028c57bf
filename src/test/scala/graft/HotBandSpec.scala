package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** VERDICT r5 item 1: distinct-text hot LSH band buckets. A templated family
  * of K DISTINCT texts (shared boilerplate, one varying word) collides in
  * band buckets by design; the uncapped self-join would emit K^2/2 candidate
  * rows before verification. These tests plant a 5000-member family and pin:
  *   - pair mode emits at most cap^2/2 pairs per bucket (HotBandCap = 256);
  *   - the neardupClusters star mode emits a LINEAR spanning set, measured
  *     with a shuffle-record listener (the no-silent-caps evidence);
  *   - hotBandStats reports the over-cap buckets (the audit surface);
  *   - clustering output is still one family component.
  */
class HotBandSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  private val K = 5000
  // 40 shared words + one unique tail word: ~38 of ~39 shingles shared, so
  // family members are near-identical but pairwise DISTINCT texts
  private lazy val family = {
    val base = (1 to 40).map(i => s"tmpl$i").mkString(" ")
    spark.range(1, K + 1).select(col("id").as("doc_id"),
      concat(lit(base + " uniq"), col("id").cast("string")).as("text"))
      .repartition(16)
  }

  test("pair mode: over-cap bucket emission is capped at cap^2/2 per bucket, never K^2") {
    val cand = textops.Dedup.bandCandidates(family)
    val n = cand.count()
    val capPairs = textops.Dedup.HotBandCap.toLong * (textops.Dedup.HotBandCap - 1) / 2
    // all 16 bands keep the cap-smallest ids, so the distinct union stays at
    // most a small multiple of one bucket's cap^2/2 (equal if all bands agree)
    assert(n >= capPairs / 2 && n <= 16 * capPairs,
      s"capped emission out of range: $n pairs (cap^2/2 = $capPairs)")
    assert(n < K.toLong * (K - 1) / 4, s"quadratic emission: $n pairs for $K docs")
  }

  test("hotBandStats reports the over-cap buckets — the no-silent-cap audit surface") {
    val stats = textops.Dedup.hotBandStats(
      textops.Dedup.minhashBands(family), textops.Dedup.HotBandCap).collect()
    assert(stats.nonEmpty, "expected at least one over-cap bucket for the planted family")
    assert(stats.forall(_.getLong(1) > textops.Dedup.HotBandCap))
    assert(stats.exists(_.getLong(1) >= K / 2),
      s"expected a family-sized bucket, got ${stats.map(_.getLong(1)).mkString(",")}")
  }

  test("star mode (neardupClusters path): linear candidate emission, one family component") {
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      records.set(0)
      val star = textops.Dedup.bandCandidates(family, hotStar = true)
      val nStar = star.count()
      // star edges: bucket-min -> member per band; distinct union is ~K-1
      assert(nStar <= 16L * K && nStar >= K - 1,
        s"star emission not linear-shaped: $nStar for $K docs")
      var last = -1L
      var spins = 0
      while (records.get() != last && spins < 50) {
        last = records.get(); Thread.sleep(100); spins += 1
      }
      // generous LINEAR budget: 16 band rows/doc + window + join + distinct
      // stages; the quadratic join would shuffle >= K^2/4 = 6.25M records
      assert(records.get() < 60L * K,
        s"shuffle records ${records.get()} exceed the linear budget for $K docs")
    } finally spark.sparkContext.removeSparkListener(listener)

    val clusters = textops.Dedup.neardupClusters(family)
    val labels = clusters.select("cluster_id").distinct().collect().map(_.getLong(0))
    assert(labels.length == 1 && labels(0) == 1L,
      s"family must collapse to one component rooted at doc 1, got ${labels.take(5).mkString(",")}")
  }

  test("small corpora stay under every cap: capped join == uncapped join (planted sf0.001)") {
    val docs = textops.Dedup.planted(
      spark.read.parquet(s"$sf/documents.parquet").repartition(8))
    val (reps, _) = textops.Dedup.textGroups(docs)
    val bands = textops.Dedup.minhashBands(reps)
    assert(textops.Dedup.hotBandStats(bands, textops.Dedup.HotBandCap).isEmpty,
      "test-SF buckets must stay under HotBandCap (cap chosen to be inactive)")
    // uncapped reference join
    val uncapped = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val capped = textops.Dedup.bandCandidates(reps)
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty,
      "capped candidates must be bit-identical to the uncapped join below the cap")
  }
}
