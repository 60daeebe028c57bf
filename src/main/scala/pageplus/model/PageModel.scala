package pageplus.model

/** Typed data model for one PAGE-XML document, the Spark-side equivalent of the
  * reference's lxml-DOM + dataclass views (reference: pageplus/models/page.py:22-43,
  * pageplus/models/basic_elements.py:16-21, pageplus/models/text_elements.py:263-300).
  *
  * One reference *file* = one row. All types are Spark-encodable case classes
  * (no recursion: table cells get their own type instead of a recursive region).
  * Coordinates are integer points (the reference parses `int(float(v))`,
  * pageplus/models/basic_elements.py:96-98).
  */
final case class Pt(x: Int, y: Int)

/** One pass-through XML attribute not covered by the typed model
  * (`custom`, `orientation`, `production`, ...). */
final case class AttrT(name: String, value: String)

/** Unmodeled XML carried through parse -> write so `repair`/XML-out does not
  * silently drop `Metadata`, `TextStyle`, `Glyph`, `custom` attributes, etc. —
  * the reference re-serializes its mutated DOM, so everything it never touched
  * survives (io/writer.py:4-15, models/page.py:94-103). `children` holds each
  * unmodeled DIRECT child element re-serialized as canonical XML text (single
  * default namespace; original byte formatting is not preserved, content is).
  * Captured only on the full parse — the text-only extraction hot path skips
  * the capture the way it skips geometry decoding. */
final case class NodeExtras(attrs: Seq[AttrT] = Nil, children: Seq[String] = Nil) {
  def isEmpty: Boolean = attrs.isEmpty && children.isEmpty
}

/** Document-level pass-through: PcGts-level (Metadata, pcGtsId) and Page-level
  * (Border, PrintSpace, custom/orientation attrs) slots. */
final case class DocExtras(pcgts: NodeExtras = NodeExtras(), page: NodeExtras = NodeExtras())

/** One `TextEquiv` child: `index` attribute (missing attr defaults to 0,
  * basic_elements.py:120) and the `Unicode` text (itertext join; empty element -> "").
  */
final case class TextEquivT(index: Int, unicode: String)

final case class WordT(
    id: String,
    hasCoords: Boolean,
    coords: Seq[Pt],
    texts: Seq[TextEquivT],
    extras: NodeExtras = NodeExtras())

/** One `TextLine`.
  *
  * @param unicodes document-order list of every non-empty `.//Unicode` direct-text
  *   under this line (line-level TextEquivs AND Word-level ones, in document order)
  *   — exactly the node set `extract_fulltext` iterates (models/page.py:146-150,
  *   which filters `if unicode_ele.text`, so storing only truthy values is lossless
  *   for extraction).
  */
final case class LineT(
    id: String,
    hasCoords: Boolean,
    coords: Seq[Pt],
    hasBaseline: Boolean,
    baseline: Seq[Pt],
    texts: Seq[TextEquivT],
    words: Seq[WordT],
    unicodes: Seq[String],
    extras: NodeExtras = NodeExtras()) {

  /** `get_text`: first TextEquiv whose index attr (default 0) == 0
    * (basic_elements.py:116-122). Returns null when absent, like the reference's None. */
  def getText: String =
    texts.find(_.index == 0).map(_.unicode).orNull

  def isTextEmpty: Boolean = {
    val t = getText
    t == null || PyStr.strip(t).isEmpty
  }
}

/** A `TableCell` (inherits TextRegion behavior in the reference,
  * models/table_elements.py:33-35). */
final case class CellT(
    id: String,
    hasCoords: Boolean,
    coords: Seq[Pt],
    texts: Seq[TextEquivT],
    lines: Seq[LineT],
    extras: NodeExtras = NodeExtras())

/** A `TextRegion` (kind="text", cells empty) or `TableRegion` (kind="table",
  * lines empty, cells populated) — the `kind` field replaces the Python class
  * hierarchy (models/text_elements.py:19-25, models/table_elements.py:18-35). */
final case class RegionT(
    id: String,
    kind: String,
    hasCoords: Boolean,
    coords: Seq[Pt],
    texts: Seq[TextEquivT],
    lines: Seq[LineT],
    cells: Seq[CellT],
    extras: NodeExtras = NodeExtras())

/** One parsed PAGE-XML document.
  *
  * @param readingOrder region-ref ids of the LAST OrderedGroup, sorted by int(@index)
  *   (literal last-group-wins semantics, models/page.py:45-57)
  * @param docOrderRegionIds all TextRegion/TableRegion ids in document order
  *   (the mode='document' / empty-auto fallback, models/page.py:58-64)
  * @param parseOk false for malformed XML or non-PAGE namespace — the reference
  *   silently drops such files at scan time (io/utils.py:36-47); at table grain we
  *   keep them as error rows instead.
  */
final case class PageDoc(
    url: String,
    ns: String,
    width: Int,
    height: Int,
    imageFilename: String,
    readingOrder: Seq[String],
    docOrderRegionIds: Seq[String],
    regions: Seq[RegionT],
    parseOk: Boolean,
    parseError: String,
    extras: DocExtras = DocExtras()) {

  /** textregions in the reference sense: every TextRegion element (models/page.py:37-39). */
  def textRegions: Seq[RegionT] = regions.filter(_.kind == "text")
  def tableRegions: Seq[RegionT] = regions.filter(_.kind == "table")
}

/** Input-table row shape (BASELINE.json input_hint):
  * pages(url, warc_ts, html, text, lang). */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** One validation / repair / lineage report row — the engine's first-class
  * replacement for the reference's log-file-as-output (io/logger.py:5-7). */
final case class Report(
    url: String,
    elementId: String,
    rule: String,
    severity: String,
    message: String)

/** Python string-semantics helpers, used where byte parity with CPython matters
  * (SURVEY §7.4.4). */
object PyStr {
  /** Python str.isspace() for a single char: Unicode Zs/Zl/Zp categories plus the
    * bidirectional WS/B/S control set. Differs from Java Character.isWhitespace on
    * U+00A0, U+2007, U+202F (Python strips them, Java does not). */
  def isSpace(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
    t == Character.PARAGRAPH_SEPARATOR ||
    (c >= '\t' && c <= '\r') || (c >= '\u001C' && c <= '\u001F') || c == '\u0085'
  }

  /** Python str.strip() (no args). */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  def lstrip(s: String): String = {
    var i = 0
    while (i < s.length && isSpace(s.charAt(i))) i += 1
    s.substring(i)
  }

  /** Python str.rstrip(chars): drop trailing chars that appear in `chars`. */
  def rstripChars(s: String, chars: String): String = {
    var j = s.length
    while (j > 0 && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(0, j)
  }

  /** Python str.split() (no args): split on runs of whitespace, no empties. */
  def split(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.result()
  }

  /** Python len(str): code points, not UTF-16 units. */
  def len(s: String): Int = s.codePointCount(0, s.length)
}
