package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-ordered token-budget selection — the "data diet": keep the
  * best-scoring documents, in score order, until a global token budget is
  * exhausted. Unlike a top-k (rows) cut, the stopping point depends on the
  * running token SUM, so the primitive is an exact global prefix sum in
  * quality order — the same two-pass shape as [[SequencePack]], but ordered
  * by `(quality DESC, doc_id)` instead of doc_id: range-partition on the
  * composite key, per-partition sums to the driver (partition-count-sized),
  * broadcast starting offsets, second pass emits each doc's
  * tokens-before-me. No corpus-sized single-task Window anywhere.
  *
  * The quality signal is the type-token ratio in per-1000 basis points
  * (`distinct words * 1000 div words` — low TTR flags repetitive/templated
  * spam), exact integer and map-side; any integer doc-grain score slots in.
  * A doc is selected iff the budget is not yet exhausted when its turn
  * arrives (`tokens_before < budget`), so exactly one doc may straddle the
  * boundary — the deterministic greedy-prefix convention.
  */
object TokenBudget {

  /** `(doc_id, quality_bp, n_tokens, cum_before, selected)` for every doc;
    * `cum_before` = total tokens of strictly-better `(quality_bp DESC,
    * doc_id)` docs; `selected` = `cum_before < budget`. */
  def select(docs: DataFrame, budget: Long = 13000L): DataFrame = {
    require(budget >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = docs
      .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
      .selectExpr("doc_id",
        "cast(size(array_distinct(ws)) as bigint) * 1000 div size(ws) AS quality_bp",
        "cast(size(ws) as bigint) AS n_tokens")
    val parts = spark.sparkContext.defaultParallelism
    val ranged = scored
      .repartitionByRange(parts, col("quality_bp").desc, col("doc_id"))
      .sortWithinPartitions(col("quality_bp").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .cache()
    // pass 1: per-partition token sums (range partitioner may emit fewer
    // partitions than requested — size the offset table off the RDD)
    val nParts = ranged.rdd.getNumPartitions
    val partSums = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach { case (_, _, n) => s += n }
      Iterator((pid, s))
    }.collect().sortBy(_._1)
    val starts = new Array[Long](nParts)
    var acc = 0L
    partSums.foreach { case (pid, s) => starts(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(starts)
    // pass 2: addressed by the RDD split index (stable under downstream
    // stage fusion — the withPrefixSum contract)
    val out = spark.createDataset(ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = bc.value(pid)
      it.map { case (id, q, n) =>
        val before = off
        off += n
        (id, q, n, before, before < budget)
      }
    }).toDF("doc_id", "quality_bp", "n_tokens", "cum_before", "selected")
      .localCheckpoint(true)
    ranged.unpersist() // cache released after pass 2 materializes (ADVICE r4)
    out
  }
}
