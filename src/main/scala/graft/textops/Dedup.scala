package graft.textops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over a `documents(doc_id, text, ...)` table:
  * exact (hash group-by), MinHash+LSH (shingle -> minhash -> band -> bucket
  * self-join -> exact-Jaccard verify), SimHash (chunk-key candidates -> hamming),
  * and n-gram Jaccard rerank.
  *
  * Scale notes (100 TB shape): signatures are computed map-side with zero
  * shuffle; the only shuffles are the band-key self-join (keys are uniform
  * 64-bit hashes — exact-duplicate clusters are the one skew source, handled by
  * AQE skew-join at scale) and the final candidate->text verify joins, which
  * touch only candidate rows, not the corpus.
  */
object Dedup {

  /** Deterministically plant near-duplicates: every doc gets a twin
    * (doc_id + PlantOffset) with the first word dropped — word-shingle Jaccard
    * (n-3)/(n-2), well above threshold for realistic docs. */
  val PlantOffset = 1000000L

  def planted(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val twin = docs.select(
      (col("doc_id") + PlantOffset).as("doc_id"),
      // drop first word: substring after the first space (docs are single-spaced)
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    base.unionByName(twin)
  }

  /** Same but perturbing the tail (for SimHash). */
  def plantedTail(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val twin = docs.select(
      (col("doc_id") + PlantOffset).as("doc_id"),
      expr("substring(text, 1, length(text) - instr(reverse(text), ' '))").as("text"))
    base.unionByName(twin)
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * Returns (a, b, inter, un) with a < b and inter/un >= threshold — the
    * intersection/union sizes are exact integers so the DuckDB oracle needs no
    * float rounding (threshold 4/5 becomes the filter 5*inter >= 4*un). */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val sig = TextHash.minHashSignature(TextHash.wordShingles(t))
        TextHash.bandKeys(sig).map(b => (id, b))
      })
      .toDF("doc_id", "band")
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verifyJaccard(docs, candidates, threshold)
  }

  /** Exact word-shingle Jaccard for candidate pairs (join back to texts —
    * touches only candidates, not the corpus). Emits exact integer
    * intersection/union sizes. */
  def verifyJaccard(docs: DataFrame, candidates: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ta = docs.select(col("doc_id").as("a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("b"), col("text").as("text_b"))
    candidates.join(ta, "a").join(tb, "b")
      .select(col("a"), col("b"), col("text_a"), col("text_b"))
      .as[(Long, Long, String, String)]
      .map { case (a, b, x, y) =>
        val sa = TextHash.wordShingles(x)
        val sb = TextHash.wordShingles(y)
        val inter = sa.intersect(sb).size.toLong
        (a, b, inter, sa.size + sb.size - inter)
      }
      .toDF("a", "b", "inter", "un")
      .filter(col("inter").cast("double") / col("un") >= threshold)
  }

  /** SimHash near-duplicate pairs: 16-bit chunk keys for candidates, hamming
    * distance filter. Returns (a, b, hamming). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, TextHash.simHash(t)) })
      .toDF("doc_id", "sim")
    val chunks = sigs.as[(Long, Long)]
      .flatMap { case (id, h) => TextHash.simHashChunks(h).map(c => (id, h, c)) }
      .toDF("doc_id", "sim", "chunk")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
      .distinct()
      .as[(Long, Long, Long, Long)]
      .map { case (a, b, ha, hb) => (a, b, TextHash.hamming(ha, hb)) }
      .toDF("a", "b", "hamming")
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over the near-duplicate pair graph: min-label
    * propagation to fixpoint. Each document's cluster_id is the smallest
    * doc_id reachable through near-duplicate pairs — the canonical "keep one
    * representative per duplicate cluster" step of a training-data pipeline.
    *
    * Per iteration labels flow one hop (join edges -> min over neighbors),
    * so convergence takes O(cluster diameter) rounds — near-dup clusters are
    * shallow (pairs are mutual), typically 2-3 rounds. At 10^12-doc scale the
    * same loop runs with the alternating large-star/small-star optimization
    * (O(log n) rounds); the fixpoint condition (zero changed labels) and the
    * deterministic min-label invariant are identical.
    */
  def neardupClusters(docs: DataFrame, threshold: Double = 0.8, maxIter: Int = 20): DataFrame = {
    val pairs = minhashPairs(docs, threshold).select(col("a"), col("b"))
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .withColumnRenamed("a", "src").withColumnRenamed("b", "dst")
      .cache()
    var labels = docs.select(col("doc_id")).withColumn("cluster_id", col("doc_id")).cache()
    // labels only ever DECREASE under min-propagation, so the label sum is a
    // monotone convergence witness — one cheap aggregate per iteration instead
    // of an old-vs-new join (decimal sum: 10^12 BIGINT ids would overflow a
    // BIGINT accumulator at corpus scale)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nbr")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min("nbr").as("nmin"))
      val next = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("cluster_id"))
        .cache()
      val newSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Exact char n-gram Jaccard rerank of MinHash candidates. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        TextHash.bandKeys(TextHash.minHashSignature(TextHash.wordShingles(t))).map(b => (id, b))
      }).toDF("doc_id", "band")
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val ta = docs.select(col("doc_id").as("a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("b"), col("text").as("text_b"))
    candidates.join(ta, "a").join(tb, "b")
      .select(col("a"), col("b"), col("text_a"), col("text_b"))
      .as[(Long, Long, String, String)]
      .map { case (a, b, x, y) =>
        val sa = TextHash.charShingles(x, n)
        val sb = TextHash.charShingles(y, n)
        val inter = sa.intersect(sb).size.toLong
        (a, b, inter, sa.size + sb.size - inter)
      }
      .toDF("a", "b", "inter", "un")
      .filter(col("inter").cast("double") / col("un") >= threshold)
  }
}
