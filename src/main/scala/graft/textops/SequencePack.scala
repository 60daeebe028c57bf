package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pretraining sequence packing — the LAST stage of a training-data
  * pipeline: concatenate the corpus in a canonical order (one separator
  * token between docs) and cut fixed-`budget` token sequences, so every doc
  * maps to a global token offset and the sequence ids it spans (GPT-style
  * concat-then-chunk; spans crossing sequence boundaries are how the packed
  * loader shards attention masks).
  *
  * The core is an exact GLOBAL prefix sum in document order. The naive
  * formulation — `sum(w) over (order by doc_id)` with no partition key — is
  * the classic 10^12-row scale-killer: Spark plans it as a SINGLE-partition
  * window (the whole corpus through one task). This implementation is the
  * canonical distributed two-pass prefix sum instead: range-partition by
  * doc_id (ordered ranges), pass 1 computes per-partition token sums (one
  * tiny row per partition to the driver — partition-count-sized, not
  * corpus-sized), the driver scan turns them into per-partition starting
  * offsets (broadcast), pass 2 re-walks each partition adding its offset.
  * The ranged input is cached so both passes see the identical partitioning;
  * output is partitioning-invariant (pinned by test), and no Window node
  * appears in the plan (pinned by PlanSpec).
  */
object SequencePack {

  /** The shared two-pass core: exact global prefix sum of `w` in doc_id
    * order. Returns (doc_id, w, start) rows via `emit`.
    *
    * Both passes address the broadcast offset table by the RDD partition's
    * OWN index (`mapPartitionsWithIndex`), never `TaskContext
    * .getPartitionId()`: a downstream `coalesce(1)` (e.g. a single-file
    * writer) fuses many upstream partitions into one TASK, so the task's
    * partition id lies about which ranged partition the closure is walking —
    * every fused partition would restart at the offset of partition 0. The
    * RDD split index is stable under any downstream stage fusion. */
  private def withPrefixSum[T <: Product : org.apache.spark.sql.Encoder : scala.reflect.ClassTag](
      docs: DataFrame, wExpr: org.apache.spark.sql.Column)(
      emit: (Long, Long, Long) => T): org.apache.spark.sql.Dataset[T] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val ranged = docs
      .select(col("doc_id"), wExpr.cast("long").as("w"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .cache()
    val partSums = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach { case (_, w) => s += w }
      Iterator((pid, s))
    }.collect().sortBy(_._1)
    val starts = new Array[Long](parts)
    var acc = 0L
    partSums.foreach { case (pid, s) => starts(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(starts)
    val out = spark.createDataset(ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = bc.value(pid)
      it.map { case (id, w) =>
        val start = off
        off += w
        emit(id, w, start)
      }
    }).localCheckpoint(true)
    // Materialize pass 2 while the ranged cache is still warm, THEN release
    // it (neardupClusters' cleanup pattern — ADVICE r4): the cache is
    // load-bearing for correctness (repartitionByRange resamples boundaries
    // on recompute, which would desync pass 1's offsets from pass 2's walk),
    // so it must outlive the checkpoint, but keeping it for the session
    // lifetime leaked one storage entry per invocation. The checkpointed
    // output is GC-collectable once callers drop it; the named cache is not.
    ranged.unpersist()
    out
  }

  /** (doc_id, n_tokens, offset_start, seq_first, seq_last) under `budget`
    * tokens per packed sequence; separator costs 1 token after each doc. */
  def pack(docs: DataFrame, budget: Long = 2048L): DataFrame = {
    require(budget >= 2, "budget must fit at least a separator and a token")
    val spark = docs.sparkSession
    import spark.implicits._
    withPrefixSum(docs, size(split(col("text"), " ", -1)) + 1) { (id, w, start) =>
      (id, w - 1, start, start / budget, (start + w - 1) / budget)
    }.toDF("doc_id", "n_tokens", "offset_start", "seq_first", "seq_last")
  }

  /** [[pack]] over a PRE-COMPUTED per-doc token-count table (doc_id,
    * n_tokens) — e.g. REAL tokenizer counts from `BpeTrain.encode`, the
    * production packing contract (whitespace counts misprice a BPE budget:
    * fertility > 1 means whitespace-packed sequences overflow the context
    * window). Same two-pass prefix sum; separator still costs 1. */
  def packCounts(counts: DataFrame, budget: Long = 2048L): DataFrame = {
    require(budget >= 2, "budget must fit at least a separator and a token")
    val spark = counts.sparkSession
    import spark.implicits._
    withPrefixSum(counts, col("n_tokens") + 1) { (id, w, start) =>
      (id, w - 1, start, start / budget, (start + w - 1) / budget)
    }.toDF("doc_id", "n_tokens", "offset_start", "seq_first", "seq_last")
  }

  /** Curriculum ranking — the length-based curriculum (train short-and-
    * simple first): every doc's exact GLOBAL rank under (n_words, doc_id)
    * total order. `row_number() OVER (ORDER BY ...)` with no partition key
    * is the same single-task scale-killer the prefix sum avoids; here the
    * distributed form is range-partition on the sort key + per-partition
    * COUNTS to the driver (partition-count-sized) + broadcast offsets +
    * a local index sweep. Same split-index discipline as [[withPrefixSum]]
    * (a downstream coalesce must not scramble the offsets). Output:
    * (doc_id, n_words, rank), rank 1-based. */
  def curriculumRank(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val ranged = docs
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long").as("n_words"))
      .repartitionByRange(parts, col("n_words"), col("doc_id"))
      .sortWithinPartitions("n_words", "doc_id")
      .as[(Long, Long)]
    globalRank(ranged, parts).toDF("doc_id", "n_words", "rank")
  }

  /** [[pack]] in SHUFFLED training order — the production packing order:
    * prefix-sum the token stream under the [[trainShuffle]] total order
    * (salted-FNV key, doc_id tie-break) instead of raw doc_id order, so the
    * packed sequences ARE the training batches of the shuffled epoch (one
    * composed job: shuffle + pack, not a shuffle materialization followed by
    * a re-sort). Same two-pass prefix sum, range-partitioned on the shuffle
    * key; output matches [[pack]]'s schema. */
  def packShuffled(docs: DataFrame, salt: String = "shuf",
                   budget: Long = 2048L): DataFrame = {
    require(budget >= 2, "budget must fit at least a separator and a token")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val ranged = docs
      .select(col("doc_id"),
        (size(split(col("text"), " ", -1)) + 1).cast("long").as("w"))
      .as[(Long, Long)]
      .map { case (id, w) => (id, TextHash.fnv64(s"$salt:$id") & Long.MaxValue, w) }
      .toDF("doc_id", "skey", "w")
      .repartitionByRange(parts, col("skey"), col("doc_id"))
      .sortWithinPartitions("skey", "doc_id")
      .as[(Long, Long, Long)]
      .cache()
    val partSums = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(s += _._3)
      Iterator((pid, s))
    }.collect().sortBy(_._1)
    val starts = new Array[Long](parts)
    var acc = 0L
    partSums.foreach { case (pid, s) => starts(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(starts)
    val out = spark.createDataset(ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = bc.value(pid)
      it.map { case (id, _, w) =>
        val start = off
        off += w
        (id, w - 1, start, start / budget, (start + w - 1) / budget)
      }
    }).toDF("doc_id", "n_tokens", "offset_start", "seq_first", "seq_last")
      .localCheckpoint(true)
    // same cache-release discipline as withPrefixSum (ADVICE r4)
    ranged.unpersist()
    out
  }

  /** Deterministic training shuffle — the shuffle-before-packing stage:
    * every doc's exact GLOBAL 1-based position under the
    * (fnv64(salt:doc_id) & Long.MaxValue, doc_id) total order. A reproducible
    * pseudo-random permutation with NO RNG state: re-runs and resumed jobs
    * land byte-identical orders (the epoch-reshuffle contract — change the
    * salt, e.g. "shuf1"/"shuf2", to reshuffle per epoch), unlike
    * `orderBy(rand())`, which breaks resume and retry determinism. Same
    * distributed two-pass rank as [[curriculumRank]]: range-partition on the
    * key, never the single-task global Window. The 63-bit mask keeps the key
    * non-negative so signed BIGINT order equals the oracle's unsigned
    * HUGEINT-mod order. Output: (doc_id, skey, pos), pos 1-based. */
  def trainShuffle(docs: DataFrame, salt: String = "shuf"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val ranged = docs
      .select(col("doc_id")).as[Long]
      .map(id => (id, TextHash.fnv64(s"$salt:$id") & Long.MaxValue))
      .toDF("doc_id", "skey")
      .repartitionByRange(parts, col("skey"), col("doc_id"))
      .sortWithinPartitions("skey", "doc_id")
      .as[(Long, Long)]
    globalRank(ranged, parts).toDF("doc_id", "skey", "pos")
  }

  /** Shared two-pass global rank over a range-partitioned (doc_id, key)
    * dataset already sorted within partitions: pass 1 collects per-partition
    * COUNTS (partition-count-sized), the driver prefix-sums them into
    * broadcast offsets, pass 2 sweeps a local index. Same split-index and
    * cache-release discipline as [[withPrefixSum]]. */
  private def globalRank(keyed: org.apache.spark.sql.Dataset[(Long, Long)],
                         parts: Int): org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val ranged = keyed.cache()
    val counts = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      it.foreach(_ => n += 1)
      Iterator((pid, n))
    }.collect().sortBy(_._1)
    val starts = new Array[Long](parts)
    var acc = 0L
    counts.foreach { case (pid, n) => starts(pid) = acc; acc += n }
    val bc = spark.sparkContext.broadcast(starts)
    val out = spark.createDataset(ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = bc.value(pid)
      it.map { case (id, w) =>
        r += 1
        (id, w, r)
      }
    }).localCheckpoint(true)
    // same cache-release discipline as withPrefixSum (ADVICE r4)
    ranged.unpersist()
    out
  }

  /** Byte-balanced output sharding — the writer stage that turns a curated
    * corpus into fixed-size training shards: each doc goes WHOLE into the
    * shard its global byte offset lands in (`offset div shardBytes`), so a
    * shard overflows by at most one document and no doc is ever split across
    * shard files (the tar/webdataset contract). Same distributed two-pass
    * prefix sum as [[pack]] — never a single-partition window.
    * Output: (doc_id, n_bytes, offset_start, shard). */
  def shardByBytes(docs: DataFrame, shardBytes: Long = 32768L): DataFrame = {
    require(shardBytes >= 1, "shardBytes must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    withPrefixSum(docs, length(col("text"))) { (id, w, start) =>
      (id, w, start, start / shardBytes)
    }.toDF("doc_id", "n_bytes", "offset_start", "shard")
  }

  /** Greedy NO-SPLIT bin packing — the document-boundary-respecting loader
    * shape ([[pack]] is concat-and-chunk: docs cross sequence boundaries and
    * the attention mask must cut them; this variant never splits a doc, the
    * T5/"packing without cross-contamination" contract). Docs are taken in
    * doc_id order; a doc that would overflow the `budget` opens a new bin;
    * a doc larger than the budget sits alone in an oversized bin (no-split
    * wins over the cap — data never vanishes).
    *
    * Greedy-with-reset state cannot be a prefix-sum (each bin boundary
    * depends on every earlier length), so an exact GLOBAL greedy pack is
    * inherently serial. The distributed contract instead fixes bin scope to
    * doc_id BLOCKS of `blockDocs` docs: bins never cross a block, so every
    * block packs independently — one hash shuffle on `block` +
    * sortWithinPartitions, then a single linear scan per partition with
    * O(1) carried state. The result depends only on (budget, blockDocs,
    * doc_ids, lengths) — NOT on partition count (test-pinned) — and the
    * waste vs a global greedy pack is at most one underfull bin per block.
    * Global bin ids are addressable without any cross-block pass:
    * bin_id = block*blockDocs + bin-within-block (< blockDocs bins/block,
    * each bin holds >= 1 doc).
    * Output: (doc_id, n_tokens, block, bin_id, bin_off). */
  def packGreedy(docs: DataFrame, budget: Long = 96L, blockDocs: Long = 256L): DataFrame = {
    require(budget >= 1 && blockDocs >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), expr(s"doc_id div ${blockDocs}L").as("block"),
        size(split(col("text"), " ", -1)).cast("long").as("n"))
      .repartition(col("block"))
      .sortWithinPartitions("block", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // multiple blocks per partition; state resets at each block edge
        var curBlock = Long.MinValue
        var bin = -1L
        var fill = 0L
        it.map { case (id, block, n) =>
          if (block != curBlock) { curBlock = block; bin = -1L; fill = 0L }
          if (bin < 0L || fill + n > budget) { bin += 1L; fill = 0L }
          val off = fill
          fill += n
          (id, n, block, block * blockDocs + bin, off)
        }
      }
      .toDF("doc_id", "n_tokens", "block", "bin_id", "bin_off")
  }
}
