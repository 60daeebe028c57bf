package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host document cap — FineWeb-style domain balancing: after dedup, a
  * handful of mega-hosts (forums, wikis, link farms) still dominate the token
  * count, so the mixing stage keeps at most `cap` documents per host, chosen
  * by a deterministic pseudo-random order so the kept subset is an unbiased
  * sample of the host rather than its first-crawled pages.
  *
  * Scale shape: one shuffle on host, then a rank-`cap` filter that Spark 4
  * plans as WindowGroupLimit — each map task keeps only its local top-`cap`
  * rows per host BEFORE the exchange, so a 10^8-page mega-host ships
  * cap×(input partitions touching it) rows instead of 10^8 (the same
  * partial-limit push that makes `q3_topk` scale). The order key is a
  * 31-bit LCG over doc_id chosen so the SQL oracle recomputes it exactly
  * without 64-bit overflow (doc_id*1103515245 stays under 2^63 for id
  * domains < 2^33; for full 10^12-doc ids swap in xxhash64(doc_id) — same
  * plan, the LCG exists only for oracle arithmetic parity).
  */
object HostCap {

  /** Keep at most `cap` docs per host in LCG order. Input: documents
    * (doc_id); host synthesized as site(doc_id%7). Output: (doc_id, host,
    * hv, rk) for kept rows. */
  def hostCapSample(docs: DataFrame, cap: Int = 50): DataFrame = {
    val hv = (col("doc_id") * 1103515245L + 12345L) % 2147483648L
    docs.select(col("doc_id"),
        concat(lit("site"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("host"),
        hv.as("hv"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("host").orderBy("hv", "doc_id")).cast("long"))
      .filter(col("rk") <= cap)
  }
}
