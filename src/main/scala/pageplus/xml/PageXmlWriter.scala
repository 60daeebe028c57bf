package pageplus.xml

import pageplus.model._

/** PageDoc -> PAGE-XML serializer (the XML sink side of io/writer.py:4-15 /
  * models/page.py:94-103). Deterministic element order: ReadingOrder first,
  * then regions in document order; coordinates are written through
  * [[PointCodec.format]] AS CARRIED — like the reference's writer, which
  * serializes the DOM as modified: normalization (dedup+unclose) happens
  * where `update_coordinates` ran, not again at write time.
  *
  * Unmodeled XML captured at parse time ([[pageplus.model.NodeExtras]]) is
  * re-emitted: extra attributes on each element's start tag, captured child
  * elements in a canonical slot (PcGts extras — Metadata — right after the
  * root open tag; Page extras after ReadingOrder; element extras before the
  * closing tag). Documents without extras serialize byte-identically to the
  * pre-pass-through writer. */
object PageXmlWriter {

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Attribute-value escape: also emits character references for \n/\t/\r —
    * raw ones would be folded to spaces by attribute-value normalization on
    * re-parse, breaking pass-through round-trip stability. */
  private def escAttr(s: String): String =
    esc(s).replace("\n", "&#10;").replace("\t", "&#9;").replace("\r", "&#13;")

  private def attrs(xs: Seq[AttrT]): String = {
    val sb = new java.lang.StringBuilder
    xs.foreach(a => sb.append(' ').append(a.name).append("=\"").append(escAttr(a.value)).append('"'))
    sb.toString
  }

  private def writeKids(sb: java.lang.StringBuilder, kids: Seq[String], pad: String): Unit =
    kids.foreach(k => sb.append(pad).append(k).append('\n'))

  private def writeTexts(sb: java.lang.StringBuilder, texts: Seq[TextEquivT], pad: String): Unit =
    texts.foreach { t =>
      sb.append(pad).append(s"""<TextEquiv index="${t.index}"><Unicode>${esc(t.unicode)}</Unicode></TextEquiv>""").append('\n')
    }

  private def writeLine(sb: java.lang.StringBuilder, l: LineT, pad: String): Unit = {
    sb.append(pad).append(s"""<TextLine id="${esc(l.id)}"${attrs(l.extras.attrs)}>""").append('\n')
    if (l.hasCoords)
      sb.append(pad).append(s"""  <Coords points="${PointCodec.format(l.coords)}"/>""").append('\n')
    if (l.hasBaseline)
      sb.append(pad).append(s"""  <Baseline points="${PointCodec.format(l.baseline)}"/>""").append('\n')
    l.words.foreach { w =>
      sb.append(pad).append(s"""  <Word id="${esc(w.id)}"${attrs(w.extras.attrs)}>""").append('\n')
      if (w.hasCoords)
        sb.append(pad).append(s"""    <Coords points="${PointCodec.format(w.coords)}"/>""").append('\n')
      // PAGE schema order (and .//Unicode document order): Glyph* precede
      // TextEquiv* under Word, so captured children go BEFORE the texts
      writeKids(sb, w.extras.children, pad + "    ")
      writeTexts(sb, w.texts, pad + "    ")
      sb.append(pad).append("  </Word>").append('\n')
    }
    writeTexts(sb, l.texts, pad + "  ")
    writeKids(sb, l.extras.children, pad + "  ")
    sb.append(pad).append("</TextLine>").append('\n')
  }

  def write(doc: PageDoc): String = {
    val sb = new java.lang.StringBuilder(4096)
    sb.append("""<?xml version="1.0" encoding="utf-8" standalone="yes"?>""").append('\n')
    sb.append(s"""<PcGts xmlns="${doc.ns}"${attrs(doc.extras.pcgts.attrs)}>""").append('\n')
    writeKids(sb, doc.extras.pcgts.children, " ")
    sb.append(s""" <Page imageFilename="${esc(doc.imageFilename)}" imageWidth="${doc.width}" imageHeight="${doc.height}"${attrs(doc.extras.page.attrs)}>""").append('\n')
    if (doc.readingOrder.nonEmpty) {
      sb.append("""  <ReadingOrder><OrderedGroup id="ro1">""").append('\n')
      doc.readingOrder.zipWithIndex.foreach { case (ref, i) =>
        sb.append(s"""   <RegionRefIndexed index="$i" regionRef="${esc(ref)}"/>""").append('\n')
      }
      sb.append("  </OrderedGroup></ReadingOrder>").append('\n')
    }
    writeKids(sb, doc.extras.page.children, "  ")
    doc.regions.foreach { reg =>
      val tag = if (reg.kind == "table") "TableRegion" else "TextRegion"
      sb.append(s"""  <$tag id="${esc(reg.id)}"${attrs(reg.extras.attrs)}>""").append('\n')
      if (reg.hasCoords)
        sb.append(s"""   <Coords points="${PointCodec.format(reg.coords)}"/>""").append('\n')
      reg.lines.foreach(writeLine(sb, _, "   "))
      reg.cells.foreach { c =>
        sb.append(s"""   <TableCell id="${esc(c.id)}"${attrs(c.extras.attrs)}>""").append('\n')
        if (c.hasCoords)
          sb.append(s"""    <Coords points="${PointCodec.format(c.coords)}"/>""").append('\n')
        c.lines.foreach(writeLine(sb, _, "    "))
        writeTexts(sb, c.texts, "    ")
        writeKids(sb, c.extras.children, "    ")
        sb.append("   </TableCell>").append('\n')
      }
      writeTexts(sb, reg.texts, "   ")
      writeKids(sb, reg.extras.children, "   ")
      sb.append(s"  </$tag>").append('\n')
    }
    sb.append(" </Page>").append('\n')
    sb.append("</PcGts>")
    sb.toString
  }
}
