package pageplus.data

/** Deterministic raw PAGE-XML fixtures per FIXTURES.md §3 — written as raw XML
  * strings (not through PageXmlWriter) so parser-facing quirks like shuffled
  * ReadingOrder indices, index-1-before-index-0 TextEquivs, unclosed rings and
  * malformed bytes are exercised exactly as a foreign producer would emit them.
  * Everything is a pure function of the document index.
  */
object SyntheticCorpus {

  val Ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"

  private def page(body: String, w: Int = 2000, h: Int = 3000): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PcGts xmlns="$Ns">
       | <Metadata><Creator>synthetic</Creator></Metadata>
       | <Page imageFilename="img.png" imageWidth="$w" imageHeight="$h">
       |$body
       | </Page>
       |</PcGts>""".stripMargin

  private def line(id: String, text: String, coords: String = "100,100 900,100 900,150 100,150",
                   baseline: String = "120,140 880,140", extra: String = ""): String =
    s"""  <TextLine id="$id">
       |   <Coords points="$coords"/>
       |   <Baseline points="$baseline"/>
       |$extra   <TextEquiv index="0"><Unicode>$text</Unicode></TextEquiv>
       |  </TextLine>""".stripMargin

  /** class 0: clean — 3 regions x 4 lines, line-level TextEquiv only. */
  def clean(i: Long): String = page(
    (0 until 3).map { r =>
      s"""  <TextRegion id="r$r">
         |   <Coords points="50,50 950,50 950,900 50,900"/>
         |${(0 until 4).map(l => line(s"r${r}l$l", s"doc$i region$r line$l")).mkString("\n")}
         |  </TextRegion>""".stripMargin
    }.mkString("\n"))

  /** class 1: hyphenated — exercises every dehyphe branch (models/page.py:105-135). */
  def hyphenated(i: Long): String = page(
    s"""  <TextRegion id="r0">
       |   <Coords points="50,50 950,50 950,900 50,900"/>
       |${line("l0", "basic merge hel-")}
       |${line("l1", "lo continues here")}
       |${line("l2", "upper keeps hyph-")}
       |${line("l3", "Upper word next")}
       |${line("l4", "multi trailing foo--")}
       |${line("l5", "bar rest")}
       |${line("l6", "unicode hy⸗")}
       |${line("l7", "phen joined")}
       |${line("l8", "")}
       |${line("l9", "final line")}
       |  </TextRegion>""".stripMargin)

  /** class 2: word-level text — Word Unicode precede the line TextEquiv. */
  def wordLevel(i: Long): String = page(
    s"""  <TextRegion id="r0">
       |   <Coords points="50,50 950,50 950,900 50,900"/>
       |${line("l0", "line level text", extra =
        """   <Word id="w0"><Coords points="120,120 200,145"/><TextEquiv index="0"><Unicode>wordone</Unicode></TextEquiv></Word>
          |   <Word id="w1"><Coords points="210,120 300,145"/><TextEquiv><Unicode>wordtwo</Unicode></TextEquiv></Word>
          |""".stripMargin)}
       |  </TextRegion>""".stripMargin)

  /** class 3: indexed TextEquiv — index=1 BEFORE index=0, plus a no-index one
    * on a second line (missing attr defaults to 0, basic_elements.py:120). */
  def indexedTextEquiv(i: Long): String = page(
    s"""  <TextRegion id="r0">
       |   <Coords points="50,50 950,50 950,900 50,900"/>
       |  <TextLine id="l0">
       |   <Coords points="100,100 900,100 900,150 100,150"/>
       |   <TextEquiv index="1"><Unicode>alternative</Unicode></TextEquiv>
       |   <TextEquiv index="0"><Unicode>primary</Unicode></TextEquiv>
       |  </TextLine>
       |  <TextLine id="l1">
       |   <Coords points="100,160 900,160 900,210 100,210"/>
       |   <TextEquiv><Unicode>noindex</Unicode></TextEquiv>
       |  </TextLine>
       |  </TextRegion>""".stripMargin)

  /** class 4: reading order — shuffled indices; a SECOND OrderedGroup that wins
    * (models/page.py:45-57). */
  def readingOrder(i: Long): String = page(
    s"""  <ReadingOrder>
       |   <OrderedGroup id="g0">
       |    <RegionRefIndexed index="1" regionRef="rB"/>
       |    <RegionRefIndexed index="0" regionRef="rA"/>
       |   </OrderedGroup>
       |   <OrderedGroup id="g1">
       |    <RegionRefIndexed index="1" regionRef="rA"/>
       |    <RegionRefIndexed index="0" regionRef="rB"/>
       |   </OrderedGroup>
       |  </ReadingOrder>
       |  <TextRegion id="rA">
       |   <Coords points="50,50 950,50 950,400 50,400"/>
       |${line("al0", "region A text")}
       |  </TextRegion>
       |  <TextRegion id="rB">
       |   <Coords points="50,500 950,500 950,900 50,900"/>
       |${line("bl0", "region B text", coords = "100,550 900,550 900,600 100,600", baseline = "120,590 880,590")}
       |  </TextRegion>""".stripMargin)

  /** class 5: bad rings — bow-tie, <4 points, adjacent duplicates, unclosed. */
  def badRing(i: Long): String = page(
    s"""  <TextRegion id="r0">
       |   <Coords points="50,50 950,50 950,900 50,900"/>
       |${line("l0", "bowtie", coords = "200,100 300,150 200,150 300,100")}
       |${line("l1", "threepts", coords = "100,160 900,160 500,210")}
       |${line("l2", "dups", coords = "100,220 100,220 900,220 900,270 100,270")}
       |${line("l3", "closed", coords = "100,280 900,280 900,330 100,330 100,280",
                baseline = "120,320 880,320")}
       |  </TextRegion>""".stripMargin)

  /** class 6: bad baselines — missing, one point, dup points, outside, disjoint. */
  def badBaseline(i: Long): String = page(
    s"""  <TextRegion id="r0">
       |   <Coords points="50,50 950,50 950,900 50,900"/>
       |  <TextLine id="l0">
       |   <Coords points="100,100 900,100 900,150 100,150"/>
       |   <TextEquiv index="0"><Unicode>nobaseline</Unicode></TextEquiv>
       |  </TextLine>
       |${line("l1", "onepoint", coords = "100,160 900,160 900,210 100,210", baseline = "120,200 120,200")}
       |${line("l2", "disjoint", coords = "100,220 900,220 900,270 100,270", baseline = "120,800 880,800")}
       |  </TextRegion>""".stripMargin)

  /** class 9: table — 2x2 cells, each with a line. */
  def table(i: Long): String = page(
    s"""  <TableRegion id="t0">
       |   <Coords points="50,50 950,50 950,900 50,900"/>
       |${(0 until 4).map { c =>
          val x0 = 100 + (c % 2) * 400
          val y0 = 100 + (c / 2) * 200
          s"""   <TableCell id="c$c">
             |    <Coords points="$x0,$y0 ${x0 + 380},$y0 ${x0 + 380},${y0 + 180} $x0,${y0 + 180}"/>
             |${line(s"c${c}l0", s"cell $c text", coords = s"${x0 + 10},${y0 + 10} ${x0 + 370},${y0 + 10} ${x0 + 370},${y0 + 60} ${x0 + 10},${y0 + 60}", baseline = s"${x0 + 20},${y0 + 50} ${x0 + 360},${y0 + 50}")}
             |   </TableCell>""".stripMargin
        }.mkString("\n")}
       |  </TableRegion>""".stripMargin)

  /** class 10: edge — empty region, empty Unicode, '0,0 0,0' parent sentinel. */
  def edge(i: Long): String = page(
    s"""  <TextRegion id="rEmpty">
       |   <Coords points="50,50 400,50 400,200 50,200"/>
       |  </TextRegion>
       |  <TextRegion id="rSentinel">
       |   <Coords points="0,0 0,0"/>
       |${line("sl0", "sentinel parent", coords = "100,300 900,300 900,350 100,350", baseline = "120,340 880,340")}
       |  </TextRegion>
       |  <TextRegion id="rBlank">
       |   <Coords points="50,400 950,400 950,600 50,600"/>
       |${line("bl0", "", coords = "100,420 900,420 900,470 100,470", baseline = "120,460 880,460")}
       |  </TextRegion>""".stripMargin)

  /** class 11: mega-doc (skew driver, FIXTURES §3): many regions x lines. */
  def megaDoc(i: Long, regions: Int = 50, linesPer: Int = 10): String = page(
    (0 until regions).map { r =>
      s"""  <TextRegion id="m$r">
         |   <Coords points="50,50 950,50 950,900 50,900"/>
         |${(0 until linesPer).map(l => line(s"m${r}l$l", s"mega $r $l")).mkString("\n")}
         |  </TextRegion>""".stripMargin
    }.mkString("\n"))

  /** class 12: nested mega-doc — every region carries a NESTED region, so its
    * lines appear both inside the parent (ele.iter parity) and as the nested
    * region's own object (root.iter); page-level `.//TextLine` extraction must
    * emit each line exactly once even on the skew-split chunking path. */
  def megaDocNested(i: Long, regions: Int = 40, linesPer: Int = 8): String = page(
    (0 until regions).map { r =>
      s"""  <TextRegion id="n$r">
         |   <Coords points="50,50 950,50 950,900 50,900"/>
         |${(0 until linesPer).map(l => line(s"n${r}l$l", s"outer $r $l")).mkString("\n")}
         |   <TextRegion id="n${r}i">
         |${(0 until linesPer).map(l => line(s"n${r}il$l", s"inner $r $l")).mkString("\n")}
         |   </TextRegion>
         |${line(s"n${r}t", s"tail $r")}
         |  </TextRegion>""".stripMargin
    }.mkString("\n"))

  def malformed(i: Long): String = "<PcGts xmlns=\"" + Ns + "\"><Page>"
  def nonPage(i: Long): String = """<html><body>not a page</body></html>"""
}
