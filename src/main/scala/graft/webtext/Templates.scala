package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-grain template stripping — the per-site complement of the C4
  * corpus-frequency line dedup ([[graft.textops.Dedup.lineDedup]]).
  *
  * Web boilerplate is overwhelmingly SITE-local: nav bars, cookie banners and
  * footers repeat across one host's pages but not across the web, so a
  * corpus-global threshold either misses them (absolute count too high for a
  * small site) or over-fires (a quote shared by a few hundred unrelated pages
  * is not boilerplate). The standard fix — used by C4's followers at site
  * grain — is a WITHIN-HOST document-frequency ratio: a line is template iff
  * it appears in >= num/den of the host's documents. A line shared by a small
  * absolute number of pages on every host (syndicated promos) stays, which is
  * exactly the behavior that distinguishes this op from `line_dedup` (the
  * fixture plants such a line in 1/25 of docs and the oracle keeps it).
  *
  * Scale shape: explode to (host, doc_id, pos, line) -> per-(host, lkey)
  * document frequency on the NARROW (host-hash, 8-byte xxhash64(line)) key
  * with map-side partials; host doc totals are a host-grain aggregate
  * (≪ corpus); the frequency join back is on the same (host, lkey) key, so
  * the exchange is reused. Line text never becomes a shuffle key (CLAUDE.md
  * narrow-key rule); the threshold is the integer rational
  * `n * den >= host_docs * num` — no float comparison on the oracle path.
  * At 10^7 hosts the host-grain tables stay tiny relative to the line table;
  * skewed mega-hosts split under AQE like any hash-agg key.
  */
object Templates {

  /** Deterministic fixture: host = site(doc_id%7); a host-specific 8-word
    * banner line is prepended to EVERY doc of the host (template, must go);
    * docs with doc_id%25==0 additionally get a syndicated 8-word promo line
    * (4% of each host's docs — under the 10% gate, must stay). Both plants
    * are chunk-aligned 8-word prefixes, mirroring [[graft.textops.Dedup.plantBoilerplate]]. */
  def plantHostTemplates(docs: DataFrame): DataFrame = {
    val h = col("doc_id") % 7
    docs.select(
      col("doc_id"),
      concat(lit("site"), h.cast("string"), lit(".example.com")).as("host"),
      concat(
        lit("welcome to site"), h.cast("string"),
        lit(" official portal navigation bar menu "),
        when(col("doc_id") % 25 === 0,
          lit("shared promo line appears rarely across hosts here ")).otherwise(lit("")),
        col("text")).as("text"))
  }

  /** Strip every 8-word line whose within-host document frequency satisfies
    * `n * den >= host_docs * num`; reassemble each doc from survivors in
    * order. Input: (doc_id, host, text). Output: (doc_id, clean_text). */
  def templateStrip(docs: DataFrame, num: Long = 1L, den: Long = 10L,
                    wordsPerLine: Int = 8): DataFrame = {
    require(num > 0 && den > 0, "threshold must be a positive rational")
    val ws = split(col("text"), " ", -1)
    val nl = ceil(size(ws).cast("double") / wordsPerLine).cast("int")
    val chunkExpr = transform(sequence(lit(0), greatest(nl, lit(1)) - 1),
      i => array_join(slice(ws, i * wordsPerLine + 1, lit(wordsPerLine)), " "))
    val lines = docs
      .select(col("doc_id"), col("host"), posexplode(chunkExpr).as(Seq("pos", "line")))
      .withColumn("lkey", xxhash64(col("line")))
    // document frequency within host, on the narrow (host, lkey) key
    val freq = lines.groupBy("host", "lkey")
      .agg(countDistinct(col("doc_id")).as("n"))
    val hostDocs = docs.groupBy("host").agg(count(lit(1)).as("hd"))
    val kept = lines
      .join(freq, Seq("host", "lkey"))
      .join(hostDocs, Seq("host"))
      .filter(col("n") * den < col("hd") * num)
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), " ").as("clean_text"))
    docs.select("doc_id").join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Host common-PREFIX trim — the char-grain complement of the line-grain
    * strip above: sites that prepend the same banner/header bytes to every
    * page (WELCOME banners, breadcrumb headers) get that shared prefix cut.
    *
    * The distributed move is the min/max-lexicographic LCP identity: the
    * longest common prefix of a SET of strings equals
    * lcp(min(set), max(set)), so the whole computation is ONE host-grain
    * min/max aggregation (map-side partials carry two strings per host —
    * no pairwise comparison, no second pass to find the prefix) plus a
    * host-keyed join back (AQE broadcasts the host table when it fits; at
    * 10^8 hosts it stays a host-grain shuffle, still ≪ corpus). A host with
    * one document trims its full text by construction — callers gate on
    * n_docs if that matters; the planted fixture has none.
    *
    * Output: (doc_id, host, lcp_len, trimmed). */
  def prefixTrim(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lcps = docs.groupBy("host")
      .agg(min("text").as("mn"), max("text").as("mx"))
      .as[(String, String, String)]
      .map { case (h, mn, mx) =>
        var k = 0
        val n = math.min(mn.length, mx.length)
        while (k < n && mn.charAt(k) == mx.charAt(k)) k += 1
        (h, k.toLong)
      }
      .toDF("host", "lcp_len")
    docs.join(lcps, "host")
      .select(col("doc_id"), col("host"), col("lcp_len"),
        expr("substring(text, cast(lcp_len + 1 as int))").as("trimmed"))
  }
}
