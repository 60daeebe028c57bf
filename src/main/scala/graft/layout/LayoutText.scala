package graft.layout

import org.apache.spark.sql.{DataFrame, Dataset}

/** Layout-text reading-order reconstruction (north_rule: "PDF/layout parse").
  *
  * Real PDF text extraction receives positioned spans (page, x, y, run of
  * words) in arbitrary stream order and must rebuild reading order by layout
  * analysis: cluster x-positions into columns, order columns left-to-right,
  * rows top-to-bottom, pages in sequence. This module implements exactly that
  * over a span table — the PDF *decoder* itself is out of scope in this
  * sandbox (no PDF libs), so the span table is synthesized deterministically
  * from the documents table, the same stand-in pattern the multimodal ops use,
  * while the layout analysis (the actual algorithmic content) is real.
  *
  * Scale shape: spans are a row-per-span table (10^13-14 rows at corpus
  * scale); reconstruction is one hash shuffle on url + a per-document sort —
  * the canonical groupByKey.mapGroups pattern, skew-bounded by the largest
  * single document.
  */
object LayoutText {

  val WordsPerSpan = 4
  val LinesPerPage = 12
  val Col0X = 100
  val Col1X = 700

  /** x-gaps larger than this start a new column cluster. */
  val MinColumnGap = 300

  final case class Span(url: String, page_no: Int, x: Int, y: Int, span_text: String)
  final case class Extracted(url: String, extracted_text: String)

  /** Deterministic two-column layout of a document's words: spans of
    * [[WordsPerSpan]] words; [[LinesPerPage]] lines per page; within a page
    * the first ceil(m/2) lines fill the left column top-down, the rest the
    * right column. Emission order is scrambled by a hash so downstream code
    * cannot rely on input order. */
  def spans(docId: Long, text: String): Seq[Span] = {
    val url = s"doc://$docId"
    val lines = (if (text == null) "" else text)
      .split(" ", -1).grouped(WordsPerSpan).map(_.mkString(" ")).toVector
    val n = lines.size
    val placed = lines.zipWithIndex.map { case (t, i) =>
      val page = i / LinesPerPage
      val m = math.min(LinesPerPage, n - page * LinesPerPage) // lines on this page
      val k = i % LinesPerPage
      val half = (m + 1) / 2
      val (x, row) = if (k < half) (Col0X, k) else (Col1X, k - half)
      Span(url, page, x, 80 + 24 * row, t)
    }
    placed.sortBy(s => graft.textops.TextHash.fnv64(s"${s.url}/${s.page_no}/${s.x},${s.y}"))
  }

  /** Column clustering by x-gap: sorted distinct x positions split where the
    * gap exceeds [[MinColumnGap]]; returns each span's column index. */
  def columnOf(xs: Seq[Int]): Map[Int, Int] = {
    val sorted = xs.distinct.sorted
    var col = 0
    var prev = Int.MinValue
    val out = Map.newBuilder[Int, Int]
    sorted.foreach { x =>
      if (prev != Int.MinValue && x - prev > MinColumnGap) col += 1
      out += (x -> col)
      prev = x
    }
    out.result()
  }

  /** Reading order for one document's spans: pages ascending, columns left to
    * right, rows top to bottom; all span texts joined with single spaces. */
  def readingOrderText(ss: Seq[Span]): String = {
    val byPage = ss.groupBy(_.page_no).toSeq.sortBy(_._1)
    byPage.map { case (_, ps) =>
      val cols = columnOf(ps.map(_.x))
      ps.sortBy(s => (cols(s.x), s.y, s.x)).map(_.span_text).mkString(" ")
    }.mkString(" ")
  }

  // ---- Spark surface --------------------------------------------------------

  /** documents -> span table (url, page_no, x, y, span_text), scrambled order. */
  def spansFromDocuments(docs: DataFrame): Dataset[Span] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) => spans(id, text) }
  }

  /** Span table -> (url, extracted_text): one shuffle on url, per-document
    * layout analysis in mapGroups. */
  def extract(spanDs: Dataset[Span]): Dataset[Extracted] = {
    val spark = spanDs.sparkSession
    import spark.implicits._
    spanDs.groupByKey(_.url).mapGroups { (url, it) =>
      Extracted(url, readingOrderText(it.toSeq))
    }
  }
}
