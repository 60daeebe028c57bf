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
}
