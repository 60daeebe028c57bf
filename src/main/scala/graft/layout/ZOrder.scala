package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * move behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits of
  * two (or more) filter columns so that consecutive key ranges are small
  * HYPER-RECTANGLES instead of slabs. Writing files in z-key order gives
  * every file tight min/max ranges on BOTH dimensions, so data-skipping
  * prunes point/range predicates on either column — a doc_id-sorted layout
  * prunes doc_id perfectly and the second column not at all. At 100 TB this
  * is the difference between scanning 1/√F of the files and scanning all
  * of them, for free, at write time.
  *
  * Integer contract (oracle-mirrored): two 5-bit dimensions, d1 = doc_id
  * mod 32, d2 = length(text) mod 32; zval interleaves d1 into odd bits and
  * d2 into even bits (10-bit Morton key); file_id = zval div 64 — 16 files,
  * each EXACTLY an 8×8 tile of (d1, d2) space, hence per-file
  * max − min ≤ 7 on both dimensions (the locality invariant the spec pins).
  *
  * Scale shape: the z-key is pure bit arithmetic (codegen, map-side); the
  * per-file min/max audit is a file-grain hash aggregate. In a real writer
  * the key feeds `repartitionByRange(zval)` and the parquet footer carries
  * the min/max — this op materializes the audit table those footers would
  * contain. */
object ZOrder {

  /** Morton interleave of two `bits`-bit columns: d1 into odd, d2 into
    * even bit positions. */
  def morton(d1: Column, d2: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(d1, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(d2, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** (file_id, n_rows, min_d1, max_d1, min_d2, max_d2): the data-skipping
    * audit table of the z-ordered 16-file layout. */
  def layoutAudit(docs: DataFrame): DataFrame = {
    val z = docs.select(
      (col("doc_id") % 32).as("d1"),
      (length(col("text")).cast("long") % 32).as("d2"))
      .withColumn("zval", morton(col("d1"), col("d2"), 5))
      .withColumn("file_id", expr("zval div 64"))
    z.groupBy("file_id").agg(
      count(lit(1)).as("n_rows"),
      min("d1").as("min_d1"), max("d1").as("max_d1"),
      min("d2").as("min_d2"), max("d2").as("max_d2"))
  }
}
