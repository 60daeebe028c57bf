package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the shift-resistant dedup grain.
  * Fixed-stride chunking ([[Chunker]], `chunk_passages`) breaks under any
  * prefix edit: one inserted token shifts every later chunk boundary, so a
  * re-crawled page with a new banner re-stores its entire body. CDC cuts
  * where the CONTENT says to — a rolling window hash over the last `W`
  * tokens, boundary when its low [[MaskBits]] bits are zero — so boundaries
  * re-synchronize right after an edit and every chunk past the first
  * boundary hashes identically again (the rsync/LBFS/storage-dedup move,
  * applied at the web-corpus re-crawl grain; reference scope: PagePlus has
  * no chunking ops — beyond-reference pipeline surface).
  *
  * No min/max clamp: production CDC adds sequential min/max chunk bounds
  * (stateful per document but still map-side); we keep the pure
  * content-defined rule so both sides of the oracle stay position-local
  * and the shift-resistance property is untouched.
  *
  * Scale shape: chunking is ONE map stage (per-row token loop, no shuffle);
  * the dedup/report side shuffles only narrow (base_id, chunk_hash) keys —
  * chunk TEXT never crosses a shuffle. At 10^12 docs this is the exact
  * dedup shape with a finer, edit-stable grain.
  *
  * Everything integer-exact: token hashes are FNV-1a (mod-2^64 Long wrap),
  * the window combine is `h0*3 + h1*5 + h2*7 + h3*11 (mod 2^64)`, chunk
  * identity is FNV-1a of the chunk string — all recomputable in DuckDB
  * HUGEINT arithmetic (the doc_fingerprint precedent).
  */
object Cdc {

  val W = 4          // rolling window, tokens
  val MaskBits = 3   // boundary when low 3 bits zero → avg chunk ~8 tokens
  private val Mask = (1L << MaskBits) - 1
  private val Weights = Array(3L, 5L, 7L, 11L)
  val TwinOffset = 1000000L

  final case class Chunk(doc_id: Long, chunk_idx: Long, start_tok: Long,
                         n_tokens: Long, chunk_hash: Long)

  /** Token index cut-points (cut AFTER 0-based token i) for one document. */
  private def cuts(hs: Array[Long]): IndexedSeq[Int] =
    // boundaries live at i in [W-1, n-2]: a cut after the last token would
    // only create an empty trailing chunk
    ((W - 1) until (hs.length - 1)).filter { i =>
      var k = 0L
      var j = 0
      while (j < W) { k += hs(i - W + 1 + j) * Weights(j); j += 1 }
      (k & Mask) == 0L
    }

  /** One map stage: documents → CDC chunk rows. */
  def chunks(docs: DataFrame): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].flatMap { case (id, text) =>
      chunkStrings(text).zipWithIndex.map { case ((start, toks, s), ci) =>
        Chunk(id, ci.toLong, start.toLong, toks.toLong, TextHash.fnv64(s))
      }
    }
  }

  /** (start token, token count, chunk string) triples for one document. */
  def chunkStrings(text: String): IndexedSeq[(Int, Int, String)] = {
    val toks = text.split(" ", -1)
    val hs = toks.map(TextHash.fnv64)
    val bounds = cuts(hs) :+ (toks.length - 1)
    var start = 0
    bounds.map { e =>
      val r = (start, e - start + 1, toks.slice(start, e + 1).mkString(" "))
      start = e + 1
      r
    }
  }

  /** Deterministic one-token-prefix twins: the re-crawl-with-a-new-banner
    * fixture. Twin doc_id = original + [[TwinOffset]]; the prefix token
    * varies with the doc so twins are not mutually identical. */
  def plantShifted(docs: DataFrame): DataFrame = {
    val base = docs.select("doc_id", "text")
    base.unionByName(base.select(
      (col("doc_id") + lit(TwinOffset)).as("doc_id"),
      concat(lit("banner"), pmod(col("doc_id"), lit(5L)).cast("string"),
        lit(" "), col("text")).as("text")))
  }

  /** Per-pair shift-resistance report over [[plantShifted]] docs: for each
    * original/twin pair, the twin's distinct chunk hashes and how many of
    * them the original's chunk set already contains — CDC vs the same-mean
    * fixed-stride grain (8 tokens). Share in integer bp. The expected shape
    * IS the finding: CDC shares everything after the first re-sync point,
    * fixed-stride shares ~nothing (every boundary shifted by one token). */
  def shiftReport(planted: DataFrame): DataFrame = {
    val spark = planted.sparkSession
    import spark.implicits._

    val cdc = chunks(planted)
      .select(col("doc_id"), col("chunk_hash"))
    val fixed = planted.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(" ", -1).grouped(8).map(g => (id, TextHash.fnv64(g.mkString(" "))))
      }
      .toDF("doc_id", "chunk_hash")

    def pairShares(ch: DataFrame, pfx: String): DataFrame = {
      val sides = ch
        .select(pmod(col("doc_id"), lit(TwinOffset)).as("base_id"),
          (col("doc_id") >= TwinOffset).cast("int").as("is_twin"),
          col("chunk_hash"))
        .distinct()
      sides.groupBy("base_id", "chunk_hash")
        .agg(max("is_twin").as("in_twin"), min("is_twin").as("min_side"))
        .groupBy("base_id")
        .agg(sum(col("in_twin").cast("long")).as(s"n_${pfx}"),
          sum((col("in_twin") === 1 && col("min_side") === 0).cast("long"))
            .as(s"shared_${pfx}"))
        .select(col("base_id"), col(s"n_${pfx}"), col(s"shared_${pfx}"),
          expr(s"shared_${pfx} * 10000L div n_${pfx}").as(s"${pfx}_share_bp"))
    }

    pairShares(cdc, "cdc").join(pairShares(fixed, "fixed"), "base_id")
      .withColumnRenamed("base_id", "doc_id")
  }
}
