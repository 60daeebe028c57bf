package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Paragraph-level language segmentation — the code-switching audit a
  * multilingual pretraining corpus needs before per-language mixture
  * sampling: documents that flip language mid-page (boilerplate in one
  * language wrapping content in another, machine-translated spam, forum
  * quote chains) poison per-doc language labels, so the curation pass
  * reports per-document paragraph-grain language structure instead of one
  * doc-grain guess (reference scope: PagePlus has no language ops —
  * `cli/analytics.py:1-60` stops at counts; this is beyond-reference
  * pipeline surface, same [[TextHash.langIdDetail]] heuristic as `lang_id`).
  *
  * Scale shape: the whole analysis is ONE map stage — each document's
  * paragraphs arrive in its own row, so dominant-language election and
  * adjacent-switch counting are per-row loops, never a shuffle. At 10^12
  * docs the plan is scan → map → (driver-requested) sort, nothing else.
  */
object Multilingual {

  /** Fixed multilingual paragraph bank. Each phrase's [[TextHash.langIdDetail]]
    * class is pinned (Python-validated replica, margins >= 9 integer points):
    * en(34/15), en(30/13), de(32/13), fr(32/14), es(31/14), zh(15/15 cjk). */
  val Bank: IndexedSeq[String] = IndexedSeq(
    "the cat and the dog is in the park that it likes for a walk",
    "it is the thing that works and the reason of the morning song",
    "der hund und die katze ist nicht ein tier mit zu den anderen",
    "le chat et la souris les jours des un une est pour que demain",
    "el gato los perros las casas y es una por para con del mundo",
    "数据清洗流水线测试段落样例内容")

  /** Language class of each bank phrase, shared verbatim with the oracle. */
  val BankLang: IndexedSeq[String] = IndexedSeq("en", "en", "de", "fr", "es", "zh")

  /** Deterministic code-switched corpus: paragraph 0 is the document's own
    * text, then 2 + doc_id%3 bank paragraphs at index (doc_id + 7*i) % 6
    * (7 coprime to 6 → every doc walks a different bank path). Pure builtin
    * Columns, map-side. */
  def plantCodeSwitch(docs: DataFrame): DataFrame = {
    val bankArr = array(Bank.map(lit): _*)
    docs.select(col("doc_id"),
      concat(
        array(col("text")),
        transform(
          sequence(lit(1L), lit(2L) + pmod(col("doc_id"), lit(3L))),
          i => element_at(bankArr, pmod(col("doc_id") + lit(7L) * i, lit(6L)).cast("int") + 1)))
        .as("paras"))
  }

  final case class CodeSwitchRow(
      doc_id: Long, n_paras: Long, n_langs: Long,
      dominant_lang: String, dominant_cnt: Long, n_switches: Long)

  /** Per-document paragraph-language report over a (doc_id, paras) table:
    * paragraph count, distinct-language count, dominant language (max count,
    * ties to the lexicographically smallest language), its count, and the
    * number of adjacent paragraph pairs that switch language. One typed map,
    * zero shuffle. */
  def codeswitchStats(planted: DataFrame): Dataset[CodeSwitchRow] = {
    val spark = planted.sparkSession
    import spark.implicits._
    planted.select("doc_id", "paras").as[(Long, Seq[String])].map { case (id, paras) =>
      val langs = paras.map(p => TextHash.langIdDetail(p)._1)
      val counts = langs.groupBy(identity).map { case (l, g) => (l, g.size.toLong) }
      val (domLang, domCnt) = counts.toSeq.minBy { case (l, c) => (-c, l) }
      val switches = langs.iterator.sliding(2).withPartial(false)
        .count(w => w.head != w(1))
      CodeSwitchRow(id, paras.size.toLong, counts.size.toLong, domLang, domCnt, switches.toLong)
    }
  }

  /** Host-level language consistency audit — the "is this domain's declared
    * language trustworthy" rollup that decides whether per-language mixture
    * sampling can use publisher labels or must fall back to detection: per
    * host, document count, how many documents' DETECTED language (same
    * [[TextHash.langIdDetail]] heuristic as `lang_id`) disagrees with the
    * declared `lang` column, and the majority detected language (ties to the
    * lexicographically smallest) with its count.
    *
    * Scale shape: detection is map-side; the first aggregate runs at
    * (host, detected-lang) grain with map-side partial combine (at most
    * #langs rows per host survive), and the majority election + totals are
    * windows over that host-grain table. The corpus shuffles once, as
    * counts. */
  def hostLangAudit(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val per = docs.select(col("doc_id"), col("text"), col("lang")).as[(Long, String, String)]
      .map { case (id, t, declared) =>
        val det = TextHash.langIdDetail(if (t == null) "" else t)._1
        (s"site${id % 7}.example.com", det, if (det == declared) 0L else 1L)
      }.toDF("host", "lang_pred", "mism")
    val g = per.groupBy("host", "lang_pred")
      .agg(count(lit(1)).as("n"), sum(col("mism")).as("m"))
    val wHost = org.apache.spark.sql.expressions.Window.partitionBy("host")
    val wMaj = org.apache.spark.sql.expressions.Window.partitionBy("host")
      .orderBy(desc("n"), asc("lang_pred"))
    g.withColumn("n_docs", sum(col("n")).over(wHost).cast("long"))
      .withColumn("n_mismatch", sum(col("m")).over(wHost).cast("long"))
      .withColumn("rn", row_number().over(wMaj))
      .filter(col("rn") === 1)
      .select(col("host"), col("n_docs"), col("n_mismatch"),
        col("lang_pred").as("majority_lang"), col("n").cast("long").as("majority_n"))
  }
}
