package pageplus

import org.scalatest.funsuite.AnyFunSuite

import pageplus.data.SyntheticCorpus
import pageplus.model._
import pageplus.ops.{Repair, Validate}
import pageplus.text.{FullText, Stats}
import pageplus.xml.StaxPageParser

/** End-to-end goldens (FIXTURES.md §4): expected values hand-derived from the
  * reference code paths cited inline — NOT recomputed through the engine. */
class GoldenSpec extends AnyFunSuite {

  private def parse(xml: String, url: String = "u") =
    StaxPageParser.parse(url, xml.getBytes("UTF-8"))

  test("clean: document order, 3x4 lines; ro=true falls back to doc ids, last region wins") {
    val d = parse(SyntheticCorpus.clean(7))
    val expected = (for (r <- 0 until 3; l <- 0 until 4) yield s"doc7 region$r line$l").mkString("\n")
    assert(FullText.extract(d) == expected)
    assert(FullText.extract(d, readingOrder = true) ==
      (0 until 4).map(l => s"doc7 region2 line$l").mkString("\n"))
  }

  test("hyphenated: every dehyphe branch (models/page.py:105-135), empty line dropped pre-dehyphe") {
    val d = parse(SyntheticCorpus.hyphenated(0))
    assert(FullText.extract(d, dehyphenate = true) == Seq(
      "basic merge hello",    // lowercase merge + rstrip single hyphen
      "continues here",       // mutated next line
      "upper keeps hyph-",    // uppercase: hyphen kept...
      "word next",            // ...but 'Upper' still consumed (reference quirk)
      "multi trailing foobar",// multi-hyphen rstrip
      "rest",
      "unicode hyphen",       // U+2E17 double oblique hyphen
      "joined",
      "final line").mkString("\n"))
  }

  test("word-level: Word Unicode emitted before line text, no index filter") {
    val d = parse(SyntheticCorpus.wordLevel(0))
    assert(FullText.extract(d) == "wordone\nwordtwo\nline level text")
    assert(d.regions.head.lines.head.getText == "line level text") // get_text = line TextEquiv only
  }

  test("indexed TextEquiv: extraction has no index filter, get_text wants index 0") {
    val d = parse(SyntheticCorpus.indexedTextEquiv(0))
    assert(FullText.extract(d) == "alternative\nprimary\nnoindex")
    assert(d.regions.head.lines(0).getText == "primary")
    assert(d.regions.head.lines(1).getText == "noindex") // missing index attr defaults to 0
  }

  test("reading order: LAST OrderedGroup wins, then last region of it wins (models/page.py:45-57,144-147)") {
    val d = parse(SyntheticCorpus.readingOrder(0))
    assert(d.readingOrder == Seq("rB", "rA")) // g1 sorted by index
    assert(FullText.extract(d, readingOrder = true) == "region A text")
    assert(FullText.extract(d) == "region A text\nregion B text")
  }

  test("bad rings: validation rules per line") {
    val d = parse(SyntheticCorpus.badRing(0))
    val byLine = Validate.page(d).groupBy(_.elementId).view.mapValues(_.map(_.rule)).toMap
    assert(byLine("l0").head == "ring_not_valid")
    assert(byLine("l1") == Seq("insufficient_points", "baseline_outside"))
    assert(byLine("l2") == Seq("baseline_outside")) // dup points alone don't invalidate the ring
    assert(!byLine.contains("l3")) // closed valid ring, baseline inside
  }

  test("bad rings: repair hulls exactly the failing lines and is geometry-idempotent") {
    val d = parse(SyntheticCorpus.badRing(0))
    val (repaired, reports) = Repair.page(d)
    val hulled = reports.filter(_.rule == "hull_applied").map(_.elementId)
    assert(hulled == Seq("l0", "l1"))
    assert(FullText.extract(repaired) == FullText.extract(d))
    assert(Repair.page(repaired)._1 == repaired)
  }

  test("bad baselines: missing / one-point / disjoint") {
    val d = parse(SyntheticCorpus.badBaseline(0))
    val byLine = Validate.page(d).groupBy(_.elementId).view.mapValues(_.map(_.rule)).toMap
    assert(byLine("l0") == Seq("baseline_missing"))
    assert(byLine("l1") == Seq("baseline_one_point"))
    assert(byLine("l2") == Seq("baseline_outside"))
  }

  test("table: cell traversal + counter semantics (models/page.py:68-85)") {
    val d = parse(SyntheticCorpus.table(0))
    assert(FullText.extract(d) == (0 until 4).map(c => s"cell $c text").mkString("\n"))
    val c = Stats.count(d)
    assert((c.textregions, c.tableregions, c.tablecells, c.textlines, c.words, c.glyphs) ==
      ((0L, 1L, 4L, 4L, 12L, 44L)))
  }

  test("edge: empty region info, sentinel parent, blank text") {
    val d = parse(SyntheticCorpus.edge(0))
    assert(FullText.extract(d) == "sentinel parent") // blank Unicode dropped by truthy filter
    val rules = Validate.page(d).map(r => (r.elementId, r.rule))
    assert(rules.contains(("rEmpty", "empty_region")))
    assert(rules.contains(("rSentinel", "parent_insufficient_points"))) // '0,0 0,0' = 2 tuples
    assert(rules.contains(("bl0", "text_empty")))
  }

  test("mega-doc parses completely; malformed and non-page become error rows") {
    val mega = parse(SyntheticCorpus.megaDoc(0))
    assert(mega.parseOk && mega.regions.size == 50)
    assert(FullText.docOrderLines(mega).size == 500)
    assert(!parse(SyntheticCorpus.malformed(0)).parseOk)
    assert(!parse(SyntheticCorpus.nonPage(0)).parseOk)
  }
}
