package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirror-host detection — the crawl-frontier hygiene pass that finds hosts
  * serving the SAME content set (mirrors, CDN clones, parked duplicates) so
  * the scheduler fetches one of them and the curator drops whole hosts
  * instead of re-discovering every page pairwise.
  *
  * Content-SET fingerprint per host: `bit_xor` over the DISTINCT FNV-1a
  * content hashes (order-independent, overflow-free — safe under ANSI mode,
  * where a wrapping SUM would throw) plus the distinct-doc count. Two hosts
  * are mirrors iff (fp, n) match — duplicate texts WITHIN a host collapse
  * first (set semantics), and a partial mirror (one page missing) can never
  * match because XOR over a strict subset differs unless the dropped hashes
  * cancel (a 2^-64-grade event).
  *
  * Scale shape: doc-grain map (hash) → one (host, h) DISTINCT shuffle of
  * 16-byte keys → everything after runs at HOST grain (~10^8 rows at web
  * scale, vs 10^12 docs), where the (fp, n) self-join is broadcast-sized.
  * No pairwise doc comparison anywhere. */
object Mirrors {

  /** Input: (host, text) rows. Output: (host, fp, n_docs, mirror_of) where
    * mirror_of is the lexicographically smallest OTHER host with the same
    * content set, '' if none. */
  def mirrorHosts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val th = docs.select(col("host"), col("text")).as[(String, String)]
      .map { case (h, t) => (h, graft.textops.TextHash.fnv64(t)) }
      .toDF("host", "h")
      .distinct()
    val fp = th.groupBy("host")
      .agg(expr("bit_xor(h)").as("fp"), count(lit(1)).as("n_docs"))
    val partners = fp.select(col("host").as("a_host"), col("fp"), col("n_docs"))
      .join(fp.select(col("host").as("b_host"), col("fp"), col("n_docs")),
        Seq("fp", "n_docs"))
      .where(col("a_host") =!= col("b_host"))
      .groupBy(col("a_host").as("host"))
      .agg(min(col("b_host")).as("partner"))
    fp.join(partners, Seq("host"), "left")
      .select(col("host"), col("fp"), col("n_docs"),
        coalesce(col("partner"), lit("")).as("mirror_of"))
  }
}
