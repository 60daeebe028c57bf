package pageplus.text

import pageplus.model._

/** `Page.counter` / `TextRegion.counter` / `PageCounter` semantics
  * (models/page.py:68-85, models/text_elements.py:27-41, analytics/counter.py:6-37).
  *
  * Parity notes: words use Python `str.split()` whitespace (PyStr.split), glyphs
  * count code points including spaces; lines with empty text are excluded from
  * word/glyph sums; table-cell lines count toward line/word/glyph totals but a
  * TableRegion's own (non-cell) lines do not (Page.counter sums textregions +
  * tablecells only, models/page.py:72-75).
  */
object Stats {

  final case class PageCounts(
      url: String,
      textregions: Long,
      tableregions: Long,
      tablecells: Long,
      textlines: Long,
      words: Long,
      glyphs: Long)

  private def regionCounts(lines: Seq[LineT]): (Long, Long, Long) = {
    var words = 0L
    var glyphs = 0L
    lines.foreach { l =>
      if (!l.isTextEmpty) {
        val t = l.getText
        words += PyStr.split(t).size
        glyphs += PyStr.len(t)
      }
    }
    (lines.size.toLong, words, glyphs)
  }

  final case class CorpusCounts(
      pages: Long, textregions: Long, tableregions: Long, tablecells: Long,
      textlines: Long, words: Long, glyphs: Long)

  /** Typed single-pass multi-counter (SURVEY §2.11): one Aggregator instead of
    * six separate sums — partial aggregation happens map-side like any Spark
    * agg, the buffer is just one case class. */
  object CorpusAggregator extends org.apache.spark.sql.expressions.Aggregator[PageCounts, CorpusCounts, CorpusCounts] {
    override def zero: CorpusCounts = CorpusCounts(0, 0, 0, 0, 0, 0, 0)
    override def reduce(b: CorpusCounts, p: PageCounts): CorpusCounts =
      CorpusCounts(b.pages + 1, b.textregions + p.textregions, b.tableregions + p.tableregions,
        b.tablecells + p.tablecells, b.textlines + p.textlines, b.words + p.words, b.glyphs + p.glyphs)
    override def merge(a: CorpusCounts, b: CorpusCounts): CorpusCounts =
      CorpusCounts(a.pages + b.pages, a.textregions + b.textregions, a.tableregions + b.tableregions,
        a.tablecells + b.tablecells, a.textlines + b.textlines, a.words + b.words, a.glyphs + b.glyphs)
    override def finish(r: CorpusCounts): CorpusCounts = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[CorpusCounts] =
      org.apache.spark.sql.Encoders.product[CorpusCounts]
    override def outputEncoder: org.apache.spark.sql.Encoder[CorpusCounts] =
      org.apache.spark.sql.Encoders.product[CorpusCounts]
  }

  def count(doc: PageDoc): PageCounts = {
    val countedRegions: Seq[Seq[LineT]] =
      doc.textRegions.map(_.lines) ++ doc.tableRegions.flatMap(_.cells.map(_.lines))
    var lines = 0L; var words = 0L; var glyphs = 0L
    countedRegions.foreach { ls =>
      val (l, w, g) = regionCounts(ls)
      lines += l; words += w; glyphs += g
    }
    PageCounts(
      url = doc.url,
      textregions = doc.textRegions.size.toLong,
      tableregions = doc.tableRegions.size.toLong,
      tablecells = doc.tableRegions.map(_.cells.size.toLong).sum,
      textlines = lines,
      words = words,
      glyphs = glyphs)
  }
}
