package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard integrity manifests — the "did every byte survive the copy/compact/
  * re-partition" audit a 100 TB pipeline runs after every data movement:
  * per shard, a row count, a byte count, and an ORDER-INVARIANT content
  * checksum (XOR of per-document FNV-1a hashes). Order invariance is the
  * point: two physically different layouts of the same logical shard (before
  * and after compaction, or produced by different cluster sizes) must agree,
  * and XOR is commutative/associative so the aggregate is partial-merge-safe
  * under any partitioning. Known blind spot, documented: a shard that gains
  * AND loses the same duplicate pair cancels in XOR — the row/byte counts
  * catch that class.
  *
  * Scale shape: one map-side hash per document fused into a partial
  * aggregate; the shuffle carries `shards` rows of 32 bytes. */
object Integrity {

  def shardChecksums(docs: DataFrame, shards: Int = 8): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t0) =>
        val t = if (t0 == null) "" else t0
        (id % shards, t.length.toLong, TextHash.fnv64(t))
      }
      .toDF("shard", "bytes", "h")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("bytes"),
        expr("bit_xor(h)").as("checksum"))
  }
}
