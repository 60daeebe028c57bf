package pageplus.xml

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import pageplus.model._

/** StAX pull-parser: PAGE-XML bytes -> [[PageDoc]], one call per row.
  *
  * Spark-first replacement of the reference's per-file lxml DOM load
  * (io/parser.py:5-20): designed to run inside `mapPartitions` with the
  * `XMLInputFactory` reused per thread, no DOM materialization, single pass
  * (the reference parses every file twice — sniff io/utils.py:36-44 + load).
  *
  * Faithfulness notes:
  *  - namespace is discovered from the root element (dynamic per file, like
  *    `tree.xpath('namespace-uri(.)')`), and a non-PAGE namespace or malformed
  *    XML yields `parseOk=false` instead of the reference's silent file drop
  *    (io/utils.py:42-47).
  *  - reading order: last OrderedGroup wins, refs sorted by int(@index), stable
  *    (models/page.py:45-57).
  *  - `Unicode` text is the concatenation of all character data in the element
  *    (itertext-equivalent; the corpus has no nested elements under Unicode).
  */
object StaxPageParser {

  val PageNsPrefix = "http://schema.primaresearch.org/PAGE/gts/pagecontent/"

  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }
  }

  private def empty(url: String, ok: Boolean, err: String): PageDoc =
    PageDoc(url, "", 0, 0, "", Nil, Nil, Nil, ok, err)

  def parse(url: String, bytes: Array[Byte]): PageDoc = parse(url, bytes, geom = true)

  /** Text-only parse for extraction pipelines: identical structure and text
    * (ids, unicodes, reading order, parseOk), but Coords/Baseline point
    * strings are skipped instead of decoded — `FullText.extract` never reads
    * geometry, and point decoding is a large share of parse time. `hasCoords`
    * still reflects attribute presence; the point arrays come back empty. */
  def parseTextOnly(url: String, bytes: Array[Byte]): PageDoc = parse(url, bytes, geom = false)

  private def parse(url: String, bytes: Array[Byte], geom: Boolean): PageDoc = {
    var r: XMLStreamReader = null
    try {
      r = factories.get().createXMLStreamReader(new ByteArrayInputStream(bytes))
      while (r.hasNext && r.getEventType != XMLStreamConstants.START_ELEMENT) r.next()
      if (r.getEventType != XMLStreamConstants.START_ELEMENT)
        return empty(url, ok = false, "xml_parse_error: no root element")
      val ns = Option(r.getNamespaceURI).getOrElse("")
      if (!ns.startsWith(PageNsPrefix))
        return empty(url, ok = false, s"not_page_xml: root namespace '$ns'")
      parseRoot(url, ns, r, geom)
    } catch {
      case e: Exception =>
        empty(url, ok = false, s"xml_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      if (r != null) try r.close() catch { case _: Exception => }
    }
  }

  // ---- internals -----------------------------------------------------------

  private def attr(r: XMLStreamReader, name: String): String = {
    var i = 0
    val n = r.getAttributeCount
    while (i < n) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  private def intAttr(r: XMLStreamReader, name: String, dflt: Int): Int = {
    val v = attr(r, name)
    if (v == null) dflt else try v.trim.toDouble.toInt catch { case _: NumberFormatException => dflt }
  }

  private def escXml(s: String, quot: Boolean): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => if (quot) sb.append("&quot;") else sb.append('"')
        // attribute-value normalization would fold raw \n/\t/\r to spaces on
        // re-parse; character references survive the round trip
        case '\n' if quot => sb.append("&#10;")
        case '\t' if quot => sb.append("&#9;")
        case '\r' if quot => sb.append("&#13;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** PAGE elements that are safe to capture opaquely: per the schema they
    * never contain TextLine/TextRegion/TableRegion, so opaque capture cannot
    * hide text from extraction. Everything else unknown is DESCENDED instead
    * (the reference's root.iter/ele.iter find modeled elements at any depth).
    * Glyph is listed — its TextEquiv must NOT join the word's ./TextEquiv set,
    * and its Unicode reaches extraction through the capture sink. */
  private val Passthrough: Set[String] = Set(
    "Metadata", "TextStyle", "AlternativeImage", "Border", "PrintSpace",
    "UserDefined", "Labels", "Relations", "Layers", "Glyph", "Grid", "GridPoints")

  /** Attributes of the current START_ELEMENT that are NOT in `modeled` —
    * pass-through payload (`custom`, `orientation`, ...). */
  private def extraAttrs(r: XMLStreamReader, modeled: Set[String]): Seq[AttrT] = {
    var out: List[AttrT] = Nil
    var i = r.getAttributeCount - 1
    while (i >= 0) {
      val n = r.getAttributeLocalName(i)
      if (!modeled.contains(n)) {
        val p = r.getAttributePrefix(i)
        val q = if (p != null && p.nonEmpty) p + ":" + n else n
        out = AttrT(q, r.getAttributeValue(i)) :: out
      }
      i -= 1
    }
    out
  }

  /** Non-default namespace declarations on the current START_ELEMENT, as
    * pass-through `xmlns:p` attributes (e.g. `xmlns:xsi` on PcGts) — needed
    * for prefixed pass-through attributes like `xsi:schemaLocation` to stay
    * well-formed after the writer round trip. */
  private def nsDeclAttrs(r: XMLStreamReader): Seq[AttrT] = {
    var out: List[AttrT] = Nil
    var i = r.getNamespaceCount - 1
    while (i >= 0) {
      val p = r.getNamespacePrefix(i)
      if (p != null && p.nonEmpty) out = AttrT("xmlns:" + p, r.getNamespaceURI(i)) :: out
      i -= 1
    }
    out
  }

  /** Re-serialize the current element (reader ON its START_ELEMENT) as
    * canonical XML text, consuming through its END_ELEMENT. Prefixes and
    * namespace declarations are preserved, so foreign-namespace content stays
    * foreign after a writer round trip. Any PAGE-namespace `Unicode` text
    * inside is ALSO forwarded to `unicodeSink` so `.//Unicode` extraction
    * parity survives opaque capture (a `Glyph`'s Unicode is part of the
    * reference's iterfind node set even though Glyph is unmodeled). Called
    * only for [[Passthrough]]-whitelisted elements — anything else unknown is
    * descended, never captured, so modeled elements inside arbitrary wrappers
    * are still discovered (reference root.iter parity). */
  private def captureElement(r: XMLStreamReader, ns: String,
                             unicodeSink: Seq[String] => Unit): String = {
    val sb = new java.lang.StringBuilder(64)
    val collected = Seq.newBuilder[String]
    val uniBuf = new java.lang.StringBuilder
    var uniDepth = -1
    def qname(pfx: String, local: String): String =
      if (pfx != null && pfx.nonEmpty) pfx + ":" + local else local
    def emitStart(): Unit = {
      sb.append('<').append(qname(r.getPrefix, r.getLocalName))
      var i = 0
      while (i < r.getNamespaceCount) {
        val p = r.getNamespacePrefix(i)
        sb.append(' ').append(if (p != null && p.nonEmpty) "xmlns:" + p else "xmlns")
          .append("=\"").append(escXml(r.getNamespaceURI(i), quot = true)).append('"')
        i += 1
      }
      i = 0
      while (i < r.getAttributeCount) {
        sb.append(' ').append(qname(r.getAttributePrefix(i), r.getAttributeLocalName(i)))
          .append("=\"").append(escXml(r.getAttributeValue(i), quot = true)).append('"')
        i += 1
      }
      sb.append('>')
    }
    emitStart()
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (uniDepth < 0 && r.getLocalName == "Unicode" && ns == r.getNamespaceURI) {
            uniDepth = depth
            uniBuf.setLength(0)
          }
          emitStart()
          depth += 1
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          sb.append("</").append(qname(r.getPrefix, r.getLocalName)).append('>')
          if (uniDepth == depth) {
            if (uniBuf.length > 0) collected += uniBuf.toString
            uniDepth = -1
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(escXml(r.getText, quot = false))
          if (uniDepth >= 0) uniBuf.append(r.getText)
        case _ =>
      }
    }
    unicodeSink(collected.result())
    sb.toString
  }

  /** Skip the remainder of the current element (reader is ON its START_ELEMENT). */
  private def skipElement(r: XMLStreamReader): Unit = {
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT   => depth -= 1
        case _                                =>
      }
    }
  }

  /** Collect all character data until the current element ends (itertext-join). */
  private def readText(r: XMLStreamReader): String = {
    val sb = new java.lang.StringBuilder
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT   => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(r.getText)
        case _ =>
      }
    }
    sb.toString
  }

  private def parsePoints(r: XMLStreamReader, geom: Boolean): (Boolean, Seq[Pt]) = {
    val s = attr(r, "points")
    skipElement(r)
    if (s == null) (false, Nil)
    else if (!geom) (true, Nil)
    else
      try (true, PointCodec.parse(s))
      catch { case _: NumberFormatException => (false, Nil) }
  }

  private def parseTextEquiv(r: XMLStreamReader, ns: String, unicodeSink: Seq[String] => Unit): TextEquivT = {
    val idxRaw = attr(r, "index")
    val idx = if (idxRaw == null) 0 else try idxRaw.trim.toInt catch { case _: NumberFormatException => Int.MinValue }
    var unicode: String = null
    val collected = Seq.newBuilder[String]
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "Unicode" && ns == r.getNamespaceURI) {
            val t = readText(r) // consumes up to </Unicode>
            if (unicode == null) unicode = t
            if (t.nonEmpty) collected += t
          } else depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    unicodeSink(collected.result())
    TextEquivT(idx, if (unicode == null) "" else unicode)
  }

  private def parseWord(r: XMLStreamReader, ns: String, unicodeSink: Seq[String] => Unit, geom: Boolean): WordT = {
    val id = Option(attr(r, "id")).getOrElse("")
    val xattrs = if (geom) extraAttrs(r, Set("id")) else Nil
    var hasCoords = false
    var coords: Seq[Pt] = Nil
    val texts = Seq.newBuilder[TextEquivT]
    val xkids = Seq.newBuilder[String]
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Coords" =>
              val (h, c) = parsePoints(r, geom); hasCoords = h; coords = c
            case "TextEquiv" =>
              texts += parseTextEquiv(r, ns, unicodeSink)
            // whitelisted boilerplate (Glyph, TextStyle, ...): opaque
            // pass-through on the full parse; Glyph Unicode still reaches the
            // line's .//Unicode extraction set through the sink. Text-only
            // parse and unknown wrappers descend (reference .// parity).
            case other =>
              if (geom && Passthrough.contains(other)) xkids += captureElement(r, ns, unicodeSink)
              else depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    WordT(id, hasCoords, coords, texts.result(), NodeExtras(xattrs, xkids.result()))
  }

  private def parseLine(r: XMLStreamReader, ns: String, geom: Boolean): LineT = {
    val id = Option(attr(r, "id")).getOrElse("")
    val xattrs = if (geom) extraAttrs(r, Set("id")) else Nil
    var hasCoords = false
    var coords: Seq[Pt] = Nil
    var hasBaseline = false
    var baseline: Seq[Pt] = Nil
    val texts = Seq.newBuilder[TextEquivT]
    val words = Seq.newBuilder[WordT]
    val unicodes = Seq.newBuilder[String]
    val xkids = Seq.newBuilder[String]
    val sink: Seq[String] => Unit = ss => unicodes ++= ss
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Coords" =>
              val (h, c) = parsePoints(r, geom); hasCoords = h; coords = c
            case "Baseline" =>
              val (h, c) = parsePoints(r, geom); hasBaseline = h; baseline = c
            case "TextEquiv" =>
              texts += parseTextEquiv(r, ns, sink)
            case "Word" =>
              words += parseWord(r, ns, sink, geom)
            // whitelisted boilerplate: opaque pass-through on the full
            // parse; unknown wrappers and text-only parse descend, so a
            // TextLine inside a wrapper still extracts (.// parity)
            case other =>
              if (geom && Passthrough.contains(other)) xkids += captureElement(r, ns, sink)
              else depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    LineT(id, hasCoords, coords, hasBaseline, baseline, texts.result(), words.result(),
      unicodes.result(), NodeExtras(xattrs, xkids.result()))
  }

  private def parseCell(r: XMLStreamReader, ns: String, geom: Boolean): (CellT, Seq[RegionT]) = {
    val id = Option(attr(r, "id")).getOrElse("")
    val xattrs = if (geom) extraAttrs(r, Set("id")) else Nil
    var hasCoords = false
    var coords: Seq[Pt] = Nil
    val texts = Seq.newBuilder[TextEquivT]
    val lines = Seq.newBuilder[LineT]
    val descendants = Seq.newBuilder[RegionT]
    val xkids = Seq.newBuilder[String]
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Coords"    => val (h, c) = parsePoints(r, geom); hasCoords = h; coords = c
            case "TextLine"  => lines += parseLine(r, ns, geom)
            case "TextRegion" =>
              // nested region: its own object is emitted after this element's
              // (root.iter pre-order), its lines ALSO belong here (ele.iter)
              val (nested, nd) = parseRegion(r, ns, "text", geom)
              lines ++= nested.lines
              descendants += nested; descendants ++= nd
            case "TableRegion" =>
              val (nested, nd) = parseRegion(r, ns, "table", geom)
              lines ++= nested.lines
              descendants += nested; descendants ++= nd
            case "TextEquiv" => texts += parseTextEquiv(r, ns, _ => ())
            case other =>
              if (geom && Passthrough.contains(other)) xkids += captureElement(r, ns, _ => ())
              else depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    (CellT(id, hasCoords, coords, texts.result(), lines.result(), NodeExtras(xattrs, xkids.result())),
      descendants.result())
  }

  /** PAGE-XML permits region nesting; the reference discovers regions with
    * `root.iter(...)` (pre-order, so a nested region is its OWN region object
    * appearing after its parent) while each region's textlines come from
    * `ele.iter(TextLine)` (recursive, so the parent ALSO carries the nested
    * region's lines — a nested region's lines already include its own
    * descendants'). Returns (region, nested regions in pre-order)
    * (models/page.py:38-44, text_elements.py:25). */
  private def parseRegion(r: XMLStreamReader, ns: String, kind: String,
                          geom: Boolean): (RegionT, Seq[RegionT]) = {
    val id = Option(attr(r, "id")).getOrElse("")
    val xattrs = if (geom) extraAttrs(r, Set("id")) else Nil
    var hasCoords = false
    var coords: Seq[Pt] = Nil
    val texts = Seq.newBuilder[TextEquivT]
    val lines = Seq.newBuilder[LineT]
    val cells = Seq.newBuilder[CellT]
    val descendants = Seq.newBuilder[RegionT]
    val xkids = Seq.newBuilder[String]
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Coords"    => val (h, c) = parsePoints(r, geom); hasCoords = h; coords = c
            case "TextLine"  => lines += parseLine(r, ns, geom)
            case "TableCell" =>
              val (cell, nd) = parseCell(r, ns, geom)
              cells += cell; descendants ++= nd
            case "TextRegion" =>
              val (nested, nd) = parseRegion(r, ns, "text", geom)
              lines ++= nested.lines
              descendants += nested; descendants ++= nd
            case "TableRegion" =>
              val (nested, nd) = parseRegion(r, ns, "table", geom)
              lines ++= nested.lines
              descendants += nested; descendants ++= nd
            case "TextEquiv" => texts += parseTextEquiv(r, ns, _ => ())
            case other =>
              if (geom && Passthrough.contains(other)) xkids += captureElement(r, ns, _ => ())
              else depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    (RegionT(id, kind, hasCoords, coords, texts.result(), lines.result(), cells.result(),
      NodeExtras(xattrs, xkids.result())),
      descendants.result())
  }

  /** ReadingOrder: the reference iterates EVERY descendant OrderedGroup in
    * document order (`iterfind of all descendants`) and reassigns the id list each time
    * with that group's DIRECT RegionRefIndexed children sorted by
    * int(@index) — so the group whose start tag appears LAST (for nesting:
    * the innermost/latest) wins (models/page.py:48-57). Groups are recorded
    * in start order; the last recorded one is the answer. */
  private def parseReadingOrder(r: XMLStreamReader, ns: String): Seq[String] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]

    def scanGroup(): Unit = {
      val slot = groups.length
      groups += Nil // reserve at START order; filled when this group closes
      val refs = Seq.newBuilder[(Int, String)]
      var gd = 1
      while (gd > 0) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "RegionRefIndexed" if gd == 1 =>
                refs += ((intAttr(r, "index", 0), Option(attr(r, "regionRef")).getOrElse("")))
                gd += 1
              case "OrderedGroup" =>
                scanGroup() // consumes the nested group including its END: gd unchanged
              case _ => gd += 1
            }
          case XMLStreamConstants.END_ELEMENT => gd -= 1
          case _ =>
        }
      }
      groups(slot) = refs.result().sortBy(_._1).map(_._2)
    }

    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "OrderedGroup") scanGroup() // END consumed inside
          else depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    groups.lastOption.getOrElse(Nil)
  }

  private def parseRoot(url: String, ns: String, r: XMLStreamReader, geom: Boolean): PageDoc = {
    var width = 0
    var height = 0
    var imageFilename = ""
    var readingOrder: Seq[String] = Nil
    val regions = Seq.newBuilder[RegionT]
    val docOrderIds = Seq.newBuilder[String]
    // pass-through: PcGts-level attrs (pcGtsId, xmlns:xsi, xsi:schemaLocation)
    // + children (Metadata), and Page-level attrs (custom, orientation) +
    // children (Border, PrintSpace). Full parse only — the text-only
    // extraction hot path skips capture the way it skips geometry decoding.
    val pcAttrs = if (geom) nsDeclAttrs(r) ++ extraAttrs(r, Set.empty) else Nil
    var pageAttrs: Seq[AttrT] = Nil
    val pcKids = Seq.newBuilder[String]
    val pageKids = Seq.newBuilder[String]
    // reader is on the root START_ELEMENT
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Page" =>
              width = intAttr(r, "imageWidth", 0)
              height = intAttr(r, "imageHeight", 0)
              val f = attr(r, "imageFilename")
              if (f != null) imageFilename = f
              if (geom)
                pageAttrs = extraAttrs(r, Set("imageFilename", "imageWidth", "imageHeight"))
              depth += 1
            case "ReadingOrder" =>
              readingOrder = parseReadingOrder(r, ns)
            case "TextRegion" =>
              val (reg, nested) = parseRegion(r, ns, "text", geom)
              (reg +: nested).foreach { g =>
                if (g.id.nonEmpty) docOrderIds += g.id
                regions += g
              }
            case "TableRegion" =>
              val (reg, nested) = parseRegion(r, ns, "table", geom)
              (reg +: nested).foreach { g =>
                if (g.id.nonEmpty) docOrderIds += g.id
                regions += g
              }
            case other =>
              if (geom && Passthrough.contains(other)) {
                val captured = captureElement(r, ns, _ => ())
                if (depth == 1) pcKids += captured else pageKids += captured
              } else depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    PageDoc(url, ns, width, height, imageFilename, readingOrder, docOrderIds.result(),
      regions.result(), parseOk = true, parseError = "",
      extras = DocExtras(NodeExtras(pcAttrs, pcKids.result()),
        NodeExtras(pageAttrs, pageKids.result())))
  }
}
