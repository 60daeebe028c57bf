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
