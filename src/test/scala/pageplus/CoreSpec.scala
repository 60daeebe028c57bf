package pageplus

import org.scalatest.funsuite.AnyFunSuite

import pageplus.model._
import pageplus.text.{Dehyphe, FullText}
import pageplus.xml.{PageXmlWriter, StaxPageParser}

/** Unit parity tests, expected values hand-traced through the cited reference
  * lines (SURVEY §5.2 layer 1). */
class PointCodecSpec extends AnyFunSuite {
  test("parse truncates toward zero like int(float(v)) (basic_elements.py:96-98)") {
    assert(PointCodec.parse("1.9,2.9 -1.9,-2.9") == Seq(Pt(1, 2), Pt(-1, -2)))
  }
  test("parse splits on comma or whitespace") {
    assert(PointCodec.parse("1,2 3,4") == Seq(Pt(1, 2), Pt(3, 4)))
    assert(PointCodec.parse("1 2 3 4") == Seq(Pt(1, 2), Pt(3, 4)))
  }
  test("parse drops odd trailing value (zip semantics)") {
    assert(PointCodec.parse("1,2 3") == Seq(Pt(1, 2)))
  }
  test("parse raises on garbage like the reference ValueError") {
    intercept[NumberFormatException](PointCodec.parse("a,b"))
  }
  test("dedupUnclose removes adjacent dups and the closing point (basic_elements.py:195-202)") {
    assert(PointCodec.dedupUnclose(Seq(Pt(0, 0), Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 0)))
      == Seq(Pt(0, 0), Pt(1, 0), Pt(1, 1)))
    // non-adjacent dups survive
    assert(PointCodec.dedupUnclose(Seq(Pt(0, 0), Pt(1, 0), Pt(0, 0), Pt(2, 2)))
      == Seq(Pt(0, 0), Pt(1, 0), Pt(0, 0), Pt(2, 2)))
  }
  test("format") {
    assert(PointCodec.format(Seq(Pt(1, 2), Pt(3, 4))) == "1,2 3,4")
  }
}

class PyStrSpec extends AnyFunSuite {
  test("strip handles NBSP like Python str.strip") {
    assert(PyStr.strip(" x ") == "x")
    assert(PyStr.strip(" \t\nx ") == "x")
  }
  test("split matches Python str.split() on runs and unicode spaces") {
    assert(PyStr.split("a  b c\td") == Seq("a", "b", "c", "d"))
    assert(PyStr.split("  ") == Nil)
    assert(PyStr.split("") == Nil)
  }
  test("rstripChars strips any trailing chars from the set") {
    assert(PyStr.rstripChars("foo--", "-") == "foo")
    assert(PyStr.rstripChars("foo-⸗", "-⹀⸗") == "foo")
  }
  test("len counts code points") {
    assert(PyStr.len("a😀b") == 3) // a, emoji, b
  }
  test("unicode whitespace parity with Python (NBSP, narrow NBSP, figure space, NEL)") {
    // Python str.split() treats all of these as whitespace; Java regex \\s
    // misses several: NBSP, FIGURE SPACE, NARROW NBSP, NEL, EM SPACE, IDEOGRAPHIC
    for (ws <- Seq('\u00A0', '\u2007', '\u202F', '\u0085', '\u2003', '\u3000')) {
      assert(PyStr.isSpace(ws), f"U+${ws.toInt}%04X should be Python whitespace")
      assert(PyStr.split(s"a${ws}b") == Seq("a", "b"), f"split on U+${ws.toInt}%04X")
      assert(PyStr.strip(s"${ws}x$ws") == "x", f"strip on U+${ws.toInt}%04X")
    }
    // ZERO WIDTH SPACE is NOT whitespace in Python
    assert(!PyStr.isSpace('\u200B'))
  }
}

class DehypheSpec extends AnyFunSuite {
  // all cases hand-traced through models/page.py:105-135
  test("basic merge, lowercase next word") {
    assert(Dehyphe(Seq("hel-", "lo world")) == Seq("hello", "world"))
  }
  test("uppercase next word keeps hyphen AND consumes the word (reference quirk)") {
    assert(Dehyphe(Seq("hel-", "Lo world")) == Seq("hel-", "world"))
  }
  test("multi-hyphen rstrip") {
    assert(Dehyphe(Seq("foo--", "bar x")) == Seq("foobar", "x"))
  }
  test("exact-empty lines dropped before strip") {
    assert(Dehyphe(Seq("a-", "", "b c")) == Seq("ab", "c"))
    // whitespace-only line is NOT dropped (filter is on '' exactly), then stripped
    assert(Dehyphe(Seq("a-", " ", "b")) == Seq("a-", "", "b"))
  }
  test("trailing hyphen on last line is kept") {
    assert(Dehyphe(Seq("a-")) == Seq("a-"))
  }
  test("next line fully consumed leaves empty line in output") {
    assert(Dehyphe(Seq("a-", "b")) == Seq("ab", ""))
  }
  test("U+2E17 double oblique hyphen") {
    assert(Dehyphe(Seq("a⸗", "b c")) == Seq("ab", "c"))
  }
  test("chained: consumed next line can itself merge") {
    // trace: ["x-", "y- z", "w"] -> i0: merge "xy-"? first word "y-" -> "x"+"y-" = "xy-";
    // lines[1]="z"; i1: "z" no hyphen -> "z"; i2: "w"
    assert(Dehyphe(Seq("x-", "y- z", "w")) == Seq("xy-", "z", "w"))
  }
}

class ParserSpec extends AnyFunSuite {
  private val ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"

  private val xml =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PcGts xmlns="$ns">
       | <Metadata><Creator>t</Creator></Metadata>
       | <Page imageFilename="p1.png" imageWidth="2000" imageHeight="3000">
       |  <ReadingOrder>
       |   <OrderedGroup id="g0">
       |    <RegionRefIndexed index="1" regionRef="r2"/>
       |    <RegionRefIndexed index="0" regionRef="r1"/>
       |   </OrderedGroup>
       |   <OrderedGroup id="g1">
       |    <RegionRefIndexed index="0" regionRef="r2"/>
       |   </OrderedGroup>
       |  </ReadingOrder>
       |  <TextRegion id="r1">
       |   <Coords points="100,100 900,100 900,600 100,600"/>
       |   <TextLine id="l1">
       |    <Coords points="120.7,120 880,120 880,170 120,170"/>
       |    <Baseline points="120,160 880,160"/>
       |    <Word id="w1"><Coords points="120,120 200,170"/><TextEquiv><Unicode>Wort</Unicode></TextEquiv></Word>
       |    <TextEquiv index="1"><Unicode>alt text</Unicode></TextEquiv>
       |    <TextEquiv index="0"><Unicode>line one</Unicode></TextEquiv>
       |   </TextLine>
       |  </TextRegion>
       |  <TableRegion id="t1">
       |   <Coords points="0,0 10,0 10,10 0,10"/>
       |   <TableCell id="c1">
       |    <Coords points="0,0 5,0 5,5 0,5"/>
       |    <TextLine id="cl1"><TextEquiv><Unicode>cell text</Unicode></TextEquiv></TextLine>
       |   </TableCell>
       |  </TableRegion>
       |  <TextRegion id="r2">
       |   <TextLine id="l2"><TextEquiv index="0"><Unicode>line two</Unicode></TextEquiv></TextLine>
       |   <TextLine id="l3"><TextEquiv index="0"><Unicode></Unicode></TextEquiv></TextLine>
       |  </TextRegion>
       | </Page>
       |</PcGts>""".stripMargin

  private def doc = StaxPageParser.parse("u1", xml.getBytes("UTF-8"))

  test("namespace, page attrs") {
    val d = doc
    assert(d.parseOk); assert(d.ns == ns)
    assert(d.width == 2000 && d.height == 3000 && d.imageFilename == "p1.png")
  }
  test("last OrderedGroup wins, refs sorted by int(index) (models/page.py:45-57)") {
    assert(doc.readingOrder == Seq("r2"))
    assert(doc.docOrderRegionIds == Seq("r1", "t1", "r2"))
  }
  test("line structure: coords truncation, baseline, indexed TextEquivs, words") {
    val l1 = doc.regions.head.lines.head
    assert(l1.coords.head == Pt(120, 120)) // 120.7 -> 120
    assert(l1.baseline == Seq(Pt(120, 160), Pt(880, 160)))
    assert(l1.texts.map(_.index) == Seq(1, 0))
    assert(l1.getText == "line one") // index-0 filter for get_text
    assert(l1.words.head.texts.head.unicode == "Wort")
    // doc-order Unicode capture: Word-level first (document order), truthy only
    assert(l1.unicodes == Seq("Wort", "alt text", "line one"))
  }
  test("table cells and empty Unicode") {
    val t1 = doc.regions(1)
    assert(t1.kind == "table" && t1.cells.map(_.id) == Seq("c1"))
    assert(t1.cells.head.lines.head.unicodes == Seq("cell text"))
    val r2 = doc.regions(2)
    assert(r2.lines(1).getText == "") // empty Unicode -> ""
    assert(r2.lines(1).unicodes == Nil) // truthy filter
  }
  test("malformed and non-page inputs become error rows (io/utils.py:42-47)") {
    val bad = StaxPageParser.parse("u", "<PcGts".getBytes("UTF-8"))
    assert(!bad.parseOk && bad.parseError.startsWith("xml_parse_error"))
    val notPage = StaxPageParser.parse("u", """<root xmlns="http://x/">hi</root>""".getBytes("UTF-8"))
    assert(!notPage.parseOk && notPage.parseError.startsWith("not_page_xml"))
  }
}

class NestedStructureSpec extends AnyFunSuite {
  private val ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"

  test("nested regions: inner emitted pre-order, outer carries its lines once each (root.iter / ele.iter parity)") {
    val xml =
      s"""<PcGts xmlns="$ns"><Page imageWidth="10" imageHeight="10">
         | <TextRegion id="a">
         |  <TextLine id="al"><TextEquiv><Unicode>A</Unicode></TextEquiv></TextLine>
         |  <TextRegion id="b">
         |   <TextLine id="bl"><TextEquiv><Unicode>B</Unicode></TextEquiv></TextLine>
         |  </TextRegion>
         |  <TextLine id="al2"><TextEquiv><Unicode>C</Unicode></TextEquiv></TextLine>
         | </TextRegion>
         | <TextRegion id="z"><TextLine id="zl"><TextEquiv><Unicode>Z</Unicode></TextEquiv></TextLine></TextRegion>
         |</Page></PcGts>""".stripMargin
    val d = StaxPageParser.parse("u", xml.getBytes("UTF-8"))
    assert(d.regions.map(_.id) == Seq("a", "b", "z"))
    assert(d.docOrderRegionIds == Seq("a", "b", "z"))
    // outer sees the nested region's line at its document position (ele.iter)
    assert(d.regions.head.lines.map(_.id) == Seq("al", "bl", "al2"))
    assert(d.regions(1).lines.map(_.id) == Seq("bl"))
    // page-level extraction = .//TextLine, each line exactly ONCE
    assert(FullText.extract(d) == "A\nB\nC\nZ")
    // reading_order=True resolves the nested region id on its own
    assert(FullText.lastReadingOrderLines(d.copy(readingOrder = Seq("b"))) == Seq("B"))
  }

  test("nested OrderedGroups: the group whose start appears last wins (iterfind .//* parity)") {
    val xml =
      s"""<PcGts xmlns="$ns"><Page imageWidth="10" imageHeight="10">
         | <ReadingOrder>
         |  <OrderedGroup id="outer">
         |   <RegionRefIndexed index="0" regionRef="r1"/>
         |   <OrderedGroup id="inner">
         |    <RegionRefIndexed index="1" regionRef="r3"/>
         |    <RegionRefIndexed index="0" regionRef="r2"/>
         |   </OrderedGroup>
         |   <RegionRefIndexed index="1" regionRef="r4"/>
         |  </OrderedGroup>
         | </ReadingOrder>
         | <TextRegion id="r1"><TextLine id="l1"><TextEquiv><Unicode>1</Unicode></TextEquiv></TextLine></TextRegion>
         |</Page></PcGts>""".stripMargin
    val d = StaxPageParser.parse("u", xml.getBytes("UTF-8"))
    // inner starts after outer -> inner's direct refs (index-sorted) win
    assert(d.readingOrder == Seq("r2", "r3"))
  }

  test("sibling groups still last-wins, nested regions survive the writer round trip textually") {
    val xml =
      s"""<PcGts xmlns="$ns"><Page imageWidth="10" imageHeight="10">
         | <ReadingOrder>
         |  <OrderedGroup id="g0"><RegionRefIndexed index="0" regionRef="a"/></OrderedGroup>
         |  <OrderedGroup id="g1"><RegionRefIndexed index="0" regionRef="b"/></OrderedGroup>
         | </ReadingOrder>
         | <TextRegion id="a">
         |  <TextLine id="al"><TextEquiv><Unicode>A</Unicode></TextEquiv></TextLine>
         |  <TextRegion id="b"><TextLine id="bl"><TextEquiv><Unicode>B</Unicode></TextEquiv></TextLine></TextRegion>
         | </TextRegion>
         |</Page></PcGts>""".stripMargin
    val d = StaxPageParser.parse("u", xml.getBytes("UTF-8"))
    assert(d.readingOrder == Seq("b"))
    assert(FullText.extract(d, readingOrder = true) == "B")
  }

  test("unmodeled XML (Metadata, TextStyle, Glyph, custom attrs) survives parse -> write -> parse") {
    val xml =
      s"""<PcGts xmlns="$ns" pcGtsId="pc007">
         | <Metadata><Creator>ocr-v2</Creator><Created>2020-01-01T00:00:00</Created></Metadata>
         | <Page imageWidth="100" imageHeight="100" custom="readingDirection {ltr}" orientation="0.5">
         |  <Border><Coords points="0,0 9,0 9,9 0,9"/></Border>
         |  <TextRegion id="r0" custom="structure {type:paragraph}">
         |   <TextStyle fontSize="12.0" bold="true"/>
         |   <TextLine id="l0" production="handwritten-cursive">
         |    <Word id="w0">
         |     <Glyph id="g0"><TextEquiv><Unicode>H</Unicode></TextEquiv></Glyph>
         |     <TextEquiv index="0"><Unicode>Hi</Unicode></TextEquiv>
         |    </Word>
         |    <TextEquiv index="0"><Unicode>Hi there</Unicode></TextEquiv>
         |   </TextLine>
         |  </TextRegion>
         | </Page>
         |</PcGts>""".stripMargin
    val d1 = StaxPageParser.parse("u", xml.getBytes("UTF-8"))
    // the Glyph is opaque pass-through, but its Unicode stays in the
    // .//Unicode extraction set (lxml iterfind parity): [g, word, line]
    assert(d1.regions.head.lines.head.unicodes == Seq("H", "Hi", "Hi there"))
    // glyph TextEquiv must NOT pollute the word's direct texts (./TextEquiv)
    assert(d1.regions.head.lines.head.words.head.texts == Seq(TextEquivT(0, "Hi")))
    val written = PageXmlWriter.write(d1)
    for (frag <- Seq("<Metadata>", "<Creator>ocr-v2</Creator>", "pcGtsId=\"pc007\"",
        "custom=\"readingDirection {ltr}\"", "orientation=\"0.5\"", "<Border>",
        "<TextStyle fontSize=\"12.0\" bold=\"true\"></TextStyle>",
        "custom=\"structure {type:paragraph}\"", "production=\"handwritten-cursive\"",
        "<Glyph id=\"g0\">"))
      assert(written.contains(frag), s"writer must carry: $frag\n$written")
    // stable under a second round trip, and extraction is unchanged
    val d2 = StaxPageParser.parse("u", written.getBytes("UTF-8"))
    assert(d2.extras == d1.extras)
    assert(d2.regions.map(_.extras) == d1.regions.map(_.extras))
    assert(FullText.extract(d2) == FullText.extract(d1))
    assert(PageXmlWriter.write(d2) == written)
  }

  test("a TextLine inside an UNKNOWN wrapper still extracts (descend, not capture)") {
    // only whitelisted PAGE boilerplate is captured opaquely; arbitrary
    // wrappers are walked like the reference's .//TextLine discovery,
    // on both the full and the text-only parse
    val xml =
      s"""<PcGts xmlns="$ns"><Page imageWidth="10" imageHeight="10">
         | <TextRegion id="r0">
         |  <SomeWrapper level="1">
         |   <TextLine id="l0"><TextEquiv><Unicode>hidden text</Unicode></TextEquiv></TextLine>
         |  </SomeWrapper>
         | </TextRegion>
         |</Page></PcGts>""".stripMargin
    for (d <- Seq(StaxPageParser.parse("u", xml.getBytes("UTF-8")),
                  StaxPageParser.parseTextOnly("u", xml.getBytes("UTF-8")))) {
      assert(d.regions.head.lines.map(_.id) == Seq("l0"))
      assert(FullText.extract(d) == "hidden text")
    }
  }

  test("xsi:schemaLocation keeps its prefix and xmlns:xsi declaration through the round trip") {
    val xml =
      s"""<PcGts xmlns="$ns" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
         |       xsi:schemaLocation="$ns http://example/pagecontent.xsd">
         | <Page imageWidth="10" imageHeight="10" custom="a&#10;b">
         |  <TextRegion id="r0">
         |   <TextLine id="l0"><TextEquiv><Unicode>t</Unicode></TextEquiv></TextLine>
         |  </TextRegion>
         | </Page>
         |</PcGts>""".stripMargin
    val d1 = StaxPageParser.parse("u", xml.getBytes("UTF-8"))
    val written = PageXmlWriter.write(d1)
    assert(written.contains("xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\""))
    assert(written.contains("xsi:schemaLocation="))
    // raw newline in an attribute would be normalized to a space on re-parse;
    // the writer must emit the character reference instead
    assert(written.contains("custom=\"a&#10;b\""))
    val d2 = StaxPageParser.parse("u", written.getBytes("UTF-8"))
    assert(d2.extras == d1.extras)
    assert(d2.extras.page.attrs == Seq(pageplus.model.AttrT("custom", "a\nb")))
    assert(PageXmlWriter.write(d2) == written)
  }

  test("extras-free documents serialize byte-identically to the pre-pass-through writer") {
    val d = StaxPageParser.parse("u",
      pageplus.data.SyntheticCorpus.clean(7).getBytes("UTF-8"))
    val w = PageXmlWriter.write(d)
    // Metadata from the fixture is now CARRIED (it used to be dropped); the
    // skeleton otherwise matches, and a doc parsed from our own writer output
    // (no extras) round-trips byte-identically
    val d2 = StaxPageParser.parse("u", w.getBytes("UTF-8"))
    assert(PageXmlWriter.write(d2) == w)
  }
}

class FullTextSpec extends AnyFunSuite {
  private val ns = StaxPageParser.PageNsPrefix + "2013-07-15"

  private def mkLine(id: String, texts: Seq[(Int, String)], words: Seq[String] = Nil): LineT =
    LineT(id, hasCoords = false, Nil, hasBaseline = false, Nil,
      texts.map { case (i, u) => TextEquivT(i, u) },
      words.map(w => WordT(s"$id-$w", hasCoords = false, Nil, Seq(TextEquivT(0, w)))),
      // document order in our corpus: words come before line-level TextEquivs
      words ++ texts.map(_._2).filter(_.nonEmpty))

  private def mkDoc(regions: Seq[RegionT], ro: Seq[String] = Nil): PageDoc =
    PageDoc("u", ns, 100, 100, "f.png", ro, regions.map(_.id), regions, parseOk = true, parseError = "")

  test("document order, no index-0 filter, Word-level Unicode included (models/page.py:149-150)") {
    val r = RegionT("r1", "text", hasCoords = false, Nil, Nil,
      Seq(mkLine("l1", Seq((1, "alt"), (0, "main")), words = Seq("W1")),
          mkLine("l2", Seq((0, "second")))), Nil)
    assert(FullText.extract(mkDoc(Seq(r))) == "W1\nalt\nmain\nsecond")
  }
  test("reading_order=True keeps only the last region (models/page.py:144-147)") {
    val r1 = RegionT("r1", "text", hasCoords = false, Nil, Nil, Seq(mkLine("l1", Seq((0, "one")))), Nil)
    val r2 = RegionT("r2", "text", hasCoords = false, Nil, Nil, Seq(mkLine("l2", Seq((0, "two")))), Nil)
    assert(FullText.extract(mkDoc(Seq(r1, r2), ro = Seq("r1", "r2")), readingOrder = true) == "two")
    // empty RO in auto mode falls back to document order ids -> last doc region wins
    assert(FullText.extract(mkDoc(Seq(r1, r2)), readingOrder = true) == "two")
  }
  test("table cell lines appear in document order for ro=False") {
    val cell = CellT("c1", hasCoords = false, Nil, Nil, Seq(mkLine("cl", Seq((0, "cell")))))
    val t = RegionT("t1", "table", hasCoords = false, Nil, Nil, Nil, Seq(cell))
    val r = RegionT("r1", "text", hasCoords = false, Nil, Nil, Seq(mkLine("l1", Seq((0, "after")))), Nil)
    assert(FullText.extract(mkDoc(Seq(t, r))) == "cell\nafter")
  }
  test("empty document extracts empty string, no trailing newline ever") {
    assert(FullText.extract(mkDoc(Nil)) == "")
  }
}

class RoundTripSpec extends AnyFunSuite {
  import pageplus.data.PagesFromDocuments._
  test("parse(write(doc)) == doc for generated documents") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again and again",
      "one two", "single")
    texts.zipWithIndex.foreach { case (t, i) =>
      val doc = cleanDoc(i.toLong, t)
      val rt = StaxPageParser.parse(doc.url, PageXmlWriter.write(doc).getBytes("UTF-8"))
      assert(rt == doc, s"round trip mismatch for doc $i")
      val doc2 = twoRegionDoc(100L + i, t)
      val rt2 = StaxPageParser.parse(doc2.url, PageXmlWriter.write(doc2).getBytes("UTF-8"))
      assert(rt2 == doc2)
      val doc3 = corruptDoc(200L + i, t)
      val rt3 = StaxPageParser.parse(doc3.url, PageXmlWriter.write(doc3).getBytes("UTF-8"))
      assert(rt3 == doc3)
    }
  }
  test("XML special chars survive the round trip") {
    val doc = cleanDoc(7L, "a&b <c> \"d\" e")
    val rt = StaxPageParser.parse(doc.url, PageXmlWriter.write(doc).getBytes("UTF-8"))
    assert(rt.regions.head.lines.head.getText == "a&b <c> \"d\" e")
  }
}
