package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Parallel-corpus (bitext) mining — the translation-pair stage of a
  * multilingual training pipeline: segment each side of a translation family
  * into sentences, align candidates, and gate pairs on a length-ratio prior
  * (the integer core of Gale-Church alignment: translated sentences have
  * near-proportional lengths; a pair whose lengths diverge past a ratio bound
  * is noise — navigation chrome, truncation, or misalignment).
  *
  * Scale shape: segmentation is a map-side flatMap (document-grain in,
  * sentence-grain out — rows multiply but each is tiny, the [[graft.webtext.WebText.pageLinks]]
  * pattern); alignment is ONE equi-join on the narrow `(doc_id, sent_idx)`
  * key, so the shuffle moves sentence rows once and AQE handles any
  * long-document skew. The ratio gate is a codegen'd integer comparison —
  * `greatest*den <= least*num` — never a float division, so the DuckDB oracle
  * replays every accept/reject decision bit-for-bit.
  */
object Bitext {

  val SentWords = 12

  final case class Sent(doc_id: Long, sent_idx: Long, sent: String)

  /** Fixed-word-window sentence segmentation (documents are undelimited word
    * streams; [[SentWords]]-word windows are the deterministic stand-in for a
    * punctuation segmenter). Map-side flatMap, zero shuffle. */
  def segmentWords(docs: DataFrame, wordsPer: Int = SentWords): Dataset[Sent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text
        t.split(" ", -1).grouped(wordsPer).zipWithIndex
          .map { case (ws, i) => Sent(id, i.toLong, ws.mkString(" ")) }
      }
  }

  /** Deterministic pseudo-translation FIXTURE (the sandbox stand-in for the
    * target-language side of a translation family, arriving pre-segmented the
    * way a translation-memory export would): per sentence, word order is
    * reversed (a "translation" that preserves content length); sentences with
    * sent_idx % 3 == 2 keep only their first 4 reversed words — the truncated
    * class the ratio gate must reject. Pure doc_id/text arithmetic -> plain
    * SQL oracle. */
  def pseudoTranslated(docs: DataFrame, wordsPer: Int = SentWords): Dataset[Sent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    segmentWords(docs, wordsPer).map { s =>
      val rev = s.sent.split(" ", -1).reverse
      val kept = if (s.sent_idx % 3 == 2) rev.take(4) else rev
      Sent(s.doc_id, s.sent_idx, kept.mkString(" "))
    }
  }

  /** Monotone index alignment with an integer length-ratio gate: join source
    * and target sentences on `(doc_id, sent_idx)` and mark each pair
    * `pair_ok = 1` iff `greatest(ls, lt) * rDen <= least(ls, lt) * rNum`
    * (defaults: ratio <= 13/10). Emits ALL aligned candidates with the
    * verdict rather than filtering, so downstream can both mine (pair_ok=1)
    * and audit coverage. One narrow-key shuffle join. */
  def alignByIndex(src: Dataset[Sent], tgt: Dataset[Sent],
                   rNum: Long = 13L, rDen: Long = 10L): DataFrame = {
    require(rNum >= rDen && rDen > 0, s"ratio bound must be >= 1: $rNum/$rDen")
    val s = src.toDF("doc_id", "sent_idx", "src_sent")
      .withColumn("src_chars", length(col("src_sent")).cast("long"))
    val t = tgt.toDF("doc_id", "sent_idx", "tgt_sent")
      .withColumn("tgt_chars", length(col("tgt_sent")).cast("long"))
    s.join(t, Seq("doc_id", "sent_idx"))
      .withColumn("pair_ok",
        (greatest(col("src_chars"), col("tgt_chars")) * lit(rDen) <=
          least(col("src_chars"), col("tgt_chars")) * lit(rNum)).cast("long"))
      .select("doc_id", "sent_idx", "src_sent", "tgt_sent",
        "src_chars", "tgt_chars", "pair_ok")
  }
}
