package pageplus

import org.scalatest.funsuite.AnyFunSuite

import pageplus.data.PagesFromDocuments
import pageplus.geo.Geo
import pageplus.model._
import pageplus.ops._
import pageplus.text.{Dsv, FullText}

class GeoSpec extends AnyFunSuite {
  test("ring validity reason flags self-intersection (basic_elements.py:172-178)") {
    val bowtie = Seq(Pt(200, 100), Pt(300, 150), Pt(200, 150), Pt(300, 100))
    val (valid, reason) = Geo.ringValidWithReason(bowtie)
    assert(!valid && reason.toLowerCase.contains("self-intersection"))
    assert(Geo.ringValidWithReason(Seq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10)))._1)
  }
  test("removeRepeatedPoints keeps first of each run within tolerance") {
    val ring = Seq(Pt(0, 0), Pt(0, 1), Pt(10, 0), Pt(10, 10), Pt(0, 10), Pt(0, 0))
    // (0,1) is within distance 1 of (0,0) -> dropped
    assert(Geo.removeRepeatedPoints(ring, 1.0) ==
      Seq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10), Pt(0, 0)))
  }
  test("convex hull exterior of a bow-tie is its bounding quad") {
    val hull = Geo.convexHullExterior(Seq(Pt(200, 100), Pt(300, 150), Pt(200, 150), Pt(300, 100)))
    assert(hull.toSet == Set(Pt(200, 100), Pt(300, 150), Pt(200, 150), Pt(300, 100)))
    assert(Geo.polygonValid(hull.dropRight(1)))
  }
  test("median matches np.median") {
    assert(Geo.median(Seq(50, 50, 50, 50, 380, 380, 400, 400).map(_.toDouble)) == 215.0)
    assert(Geo.median(Seq(1.0, 2.0, 10.0)) == 2.0)
  }
  test("fitFirstIntoSecond clips to the parent") {
    val child = Seq(Pt(0, 0), Pt(20, 0), Pt(20, 10), Pt(0, 10))
    val parent = Seq(Pt(5, -5), Pt(15, -5), Pt(15, 15), Pt(5, 15))
    val fitted = Geo.fitFirstIntoSecond(child, parent)
    val p = Geo.polygon(fitted)
    assert(p.getArea == 100.0) // 10 x 10 clip
  }
}

class ValidateRepairSpec extends AnyFunSuite {
  private def reportsFor(docId: Long, text: String = "w1 w2 w3 w4 w5 w6 w7 w8 w9"): Seq[Report] =
    Validate.page(PagesFromDocuments.corruptDoc(docId, text))

  test("planted defects produce exactly the oracle rules") {
    assert(reportsFor(5).isEmpty) // m=0 clean
    assert(reportsFor(1).map(r => (r.elementId, r.rule)) ==
      Seq(("r0l0", "ring_not_valid"), ("r0l0", "baseline_missing")))
    assert(reportsFor(2).map(r => (r.elementId, r.rule)) == Seq(("r0l0", "insufficient_points")))
    assert(reportsFor(3).map(r => (r.elementId, r.rule)) == Seq(("r0l0", "baseline_missing")))
    assert(reportsFor(4).map(r => (r.elementId, r.rule)) == Seq(("r0l0", "baseline_outside")))
    assert(reportsFor(35).map(r => (r.elementId, r.rule)) == Seq(("r0lE", "text_empty"))) // 35%5=0, 35%7=0
    assert(reportsFor(7).map(r => (r.elementId, r.rule)) ==
      Seq(("r0l0", "insufficient_points"), ("r0lE", "text_empty"))) // 7%5=2 AND 7%7=0
  }

  test("repair applies hull exactly for invalid-ring and insufficient-point lines, is idempotent") {
    for (id <- 0L to 9L) {
      val doc = PagesFromDocuments.corruptDoc(id, "a b c d e f g h i j")
      val (repaired, reports) = Repair.page(doc)
      val hulls = reports.count(_.rule == "hull_applied")
      val expectHull = if (id % 5 == 1 || id % 5 == 2) 1 else 0
      assert(hulls == expectHull, s"doc $id")
      // repair(repair(x)) == repair(x); note a 3-point line re-hulls forever
      // (hull of a triangle is 3 points, validate_region wants >=4 — same in
      // the reference), but the geometry is a fixpoint
      val (again, reports2) = Repair.page(repaired)
      assert(again == repaired, s"doc $id repair not idempotent")
      val expectRehull = if (id % 5 == 2) 1 else 0
      assert(reports2.count(_.rule == "hull_applied") == expectRehull, s"doc $id second pass")
      // text untouched
      assert(FullText.extract(repaired) == FullText.extract(doc))
    }
  }
}

class ExtendMergeSpec extends AnyFunSuite {
  test("extend_lines: buffer(16).mrr + fit + literal de-overlap heights (hand-derived)") {
    val doc = PagesFromDocuments.cleanDoc(0, (1 to 40).map("w" + _).mkString(" ")) // 5 lines
    val (ext, reps) = Extend.extendLines(doc)
    assert(reps.isEmpty)
    val heights = ext.regions.head.lines.map { l =>
      Geo.sideLengths(Geo.mrr(Geo.polygon(l.coords))).head.toInt
    }
    assert(heights == Seq(71, 60, 60, 60, 65))
    // single-line doc: clipped by parent only
    val (one, _) = Extend.extendLines(PagesFromDocuments.cleanDoc(1, "a b"))
    assert(Geo.sideLengths(Geo.mrr(Geo.polygon(one.regions.head.lines.head.coords))).head.toInt == 76)
  }

  test("splitOverlappingRings is a no-op for disjoint or generically-overlapping rings") {
    val a = Seq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10))
    val b = Seq(Pt(100, 100), Pt(110, 100), Pt(110, 110), Pt(100, 110))
    assert(Extend.splitOverlappingRings(a, b) == ((a, b)))
    // generic overlap, no vertex on the other ring -> literal no-op
    val c = Seq(Pt(5, 5), Pt(15, 5), Pt(15, 15), Pt(5, 15))
    assert(Extend.splitOverlappingRings(a, c) == ((a, c)))
  }

  test("sort_and_merge reassembles split lines to the exact clean extraction") {
    for (n <- Seq(1, 3, 8, 19, 24)) {
      val text = (1 to n).map("w" + _).mkString(" ")
      val doc = PagesFromDocuments.splitLinesDoc(0, text)
      val (merged, reps) = Merge.sortAndMerge(doc)
      assert(reps.isEmpty, s"n=$n")
      assert(FullText.extract(merged) == PagesFromDocuments.lineTexts(text).mkString("\n"), s"n=$n")
    }
  }

  test("sortBaselinesIntended orders by baseline y; same-height lines get the literal unconditional swap") {
    def line(id: String, y: Int): LineT =
      LineT(id, hasCoords = true, Seq(Pt(100, y - 40), Pt(900, y - 40), Pt(900, y + 10), Pt(100, y + 10)),
        hasBaseline = true, Seq(Pt(120, y), Pt(880, y)), Seq(TextEquivT(0, id)), Nil, Seq(id))
    val region = RegionT("r", "text", hasCoords = true,
      Seq(Pt(0, 0), Pt(1000, 0), Pt(1000, 1000), Pt(0, 1000)), Nil,
      Seq(line("c", 300), line("a", 100), line("b", 200)), Nil)
    val sorted = Merge.sortBaselinesIntended(region)
    assert(sorted.lines.map(_.id) == Seq("a", "b", "c"))
    // two baselines at the SAME height: buffered intersect -> unconditional swap
    val same = region.copy(lines = Seq(line("x", 100), line("y", 100)))
    assert(Merge.sortBaselinesIntended(same).lines.map(_.id) == Seq("y", "x"))
    // missing geometry anywhere: order preserved
    val noGeom = region.copy(lines = Seq(
      line("p", 200),
      LineT("q", hasCoords = false, Nil, hasBaseline = false, Nil, Seq(TextEquivT(0, "q")), Nil, Seq("q"))))
    assert(Merge.sortBaselinesIntended(noGeom).lines.map(_.id) == Seq("p", "q"))
  }

  test("merge respects the gap thresholds (no merge beyond 64/12)") {
    val far = RegionT("r", "text", hasCoords = true,
      Seq(Pt(0, 0), Pt(1000, 0), Pt(1000, 500), Pt(0, 500)), Nil,
      Seq(
        LineT("a", hasCoords = true, Seq(Pt(100, 100), Pt(400, 100), Pt(400, 150), Pt(100, 150)),
          hasBaseline = true, Seq(Pt(110, 140), Pt(390, 140)), Seq(TextEquivT(0, "A")), Nil, Seq("A")),
        LineT("b", hasCoords = true, Seq(Pt(470, 100), Pt(800, 100), Pt(800, 150), Pt(470, 150)),
          hasBaseline = true, Seq(Pt(480, 140), Pt(790, 140)), Seq(TextEquivT(0, "B")), Nil, Seq("B"))),
      Nil)
    // gap x = 480-390 = 90 > 64 -> no merge
    val (r, _) = Merge.mergeSplittedLines(far)
    assert(r.lines.size == 2)
  }
}

class DeleteDsvSpec extends AnyFunSuite {
  private val text = (1 to 17).map("w" + _).mkString(" ")

  test("delete words removes word-level unicode from extraction") {
    val doc = PagesFromDocuments.wordDoc(3, text)
    assert(FullText.extract(Delete.words(doc)) ==
      PagesFromDocuments.lineTexts(text).mkString("\n"))
  }
  test("delete line TextEquiv leaves only word-level unicode") {
    val doc = PagesFromDocuments.wordDoc(3, text)
    assert(FullText.extract(Delete.lineTextEquiv(doc)) ==
      PagesFromDocuments.lineTexts(text).map(_.takeWhile(_ != ' ')).mkString("\n"))
  }
  test("delete textlines empties text regions only") {
    val doc = PagesFromDocuments.cleanDoc(3, text)
    assert(FullText.extract(Delete.textlines(doc)) == "")
  }
  test("dsv rows carry baseline bounds/centroid and mrr area/sides") {
    val rows = Dsv.rows(PagesFromDocuments.cleanDoc(3, text))
    assert(rows.size == 3)
    val r0 = rows.head
    assert((r0.start_x, r0.start_y, r0.mean_x, r0.mean_y, r0.end_x, r0.end_y) ==
      ((120, 140, 500, 140, 880, 140)))
    assert((r0.area, r0.width, r0.length) == ((40000, 50, 800)))
    assert(r0.region == 0 && r0.id == "r0l0")
  }
  test("dsv dehyphenate: text column dehyphed, empty line drop truncates + misaligns (reference quirk)") {
    val mk = (id: String, t: String) => LineT(id, hasCoords = false, Nil, hasBaseline = false, Nil,
      Seq(TextEquivT(0, t)), Nil, if (t.nonEmpty) Seq(t) else Nil)
    val doc = PageDoc("u", "ns", 10, 10, "f", Nil, Seq("r"),
      Seq(RegionT("r", "text", hasCoords = false, Nil, Nil,
        Seq(mk("a", "foo-"), mk("b", "bar baz"), mk("c", ""), mk("d", "tail")), Nil)),
      parseOk = true, parseError = "")
    val out = Dsv.rowsDehyphenated(doc)
    // dehyphe input drops "" -> 3 texts; zip truncates to 3 rows; texts shift
    assert(out.size == 3)
    assert(out.map(r => (r.id, r.text)) ==
      Seq(("a", "foobar"), ("b", "baz"), ("c", "tail"))) // 'tail' lands on line c!
  }

  test("dsv sentinels for missing baseline / coords") {
    val line = LineT("x", hasCoords = false, Nil, hasBaseline = false, Nil,
      Seq(TextEquivT(0, "t")), Nil, Seq("t"))
    val doc = PageDoc("u", "ns", 10, 10, "f", Nil, Seq("r"),
      Seq(RegionT("r", "text", hasCoords = false, Nil, Nil, Seq(line), Nil)), parseOk = true, parseError = "")
    val r = Dsv.rows(doc).head
    assert((r.start_x, r.area, r.width, r.length) == ((-1, -1, -1, -1)))
  }
}

class AccessorsSpec extends AnyFunSuite {
  private val outer = Seq(Pt(0, 0), Pt(100, 0), Pt(100, 100), Pt(0, 100))
  private val inner = Seq(Pt(10, 10), Pt(20, 10), Pt(20, 20), Pt(10, 20))
  test("withinParent true for contained, false for escape or bad geometry") {
    assert(Accessors.withinParent(inner, outer))
    assert(!Accessors.withinParent(outer, inner))
    assert(!Accessors.withinParent(Seq(Pt(0, 0)), outer)) // exception -> false
  }
  test("overlaps by ratio (basic_elements.py:152-161)") {
    val half = Seq(Pt(0, 0), Pt(50, 0), Pt(50, 100), Pt(0, 100))
    assert(Accessors.overlaps(outer, half, ratio = 0.3))  // 50% > 30%
    assert(!Accessors.overlaps(outer, half, ratio = 0.6)) // 50% < 60%
    assert(!Accessors.overlaps(outer, Seq(Pt(200, 200), Pt(210, 200), Pt(210, 210)), 0.3))
  }
  test("pageCoords rectangle string (models/page.py:157-176)") {
    val d = pageplus.data.PagesFromDocuments.cleanDoc(0, "a b")
    assert(Accessors.pageCoordsString(d) == s"0,0 ${d.width},0 ${d.width},${d.height} 0,${d.height}")
    assert(Accessors.pagePolygon(d).getArea == d.width.toDouble * d.height)
  }
  test("containsTextline") {
    val d = pageplus.data.PagesFromDocuments.cleanDoc(0, "a b c d e f g h i")
    assert(Accessors.containsTextline(d.regions.head, "r0l0"))
    assert(!Accessors.containsTextline(d.regions.head, "nope"))
  }
}

object RepairRobustnessProps extends org.scalacheck.Properties("RepairRobustness") {
  import org.scalacheck.{Gen, Prop}

  private val ptGen = for { x <- Gen.chooseNum(-50, 2050); y <- Gen.chooseNum(-50, 3050) } yield Pt(x, y)

  private val lineGen = for {
    n <- Gen.choose(0, 7)
    pts <- Gen.listOfN(n, ptGen)
    blN <- Gen.choose(0, 4)
    bl <- Gen.listOfN(blN, ptGen)
    t <- Gen.alphaNumStr.map(_.take(20))
  } yield LineT("l", hasCoords = pts.nonEmpty, pts, hasBaseline = bl.nonEmpty, bl,
    Seq(TextEquivT(0, t)), Nil, if (t.nonEmpty) Seq(t) else Nil)

  private def mkDoc(lines: List[LineT]): PageDoc =
    PageDoc("u", pageplus.data.PagesFromDocuments.Ns, 2000, 3000, "f", Nil, Seq("r"),
      Seq(RegionT("r", "text", hasCoords = true,
        Seq(Pt(0, 0), Pt(2000, 0), Pt(2000, 3000), Pt(0, 3000)), Nil,
        lines.zipWithIndex.map { case (l, i) => l.copy(id = s"l$i") }, Nil)),
      parseOk = true, parseError = "")

  private val docGen = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, lineGen)).map(mkDoc)

  property("repair never throws and preserves extracted text") = Prop.forAll(docGen) { doc =>
    val (repaired, _) = Repair.page(doc)
    pageplus.text.FullText.extract(repaired) == pageplus.text.FullText.extract(doc)
  }

  property("extend_lines never throws and preserves extracted text") = Prop.forAll(docGen) { doc =>
    val (ext, _) = Extend.extendLines(doc)
    pageplus.text.FullText.extract(ext) == pageplus.text.FullText.extract(doc)
  }

  property("validate never throws") = Prop.forAll(docGen) { doc =>
    Validate.page(doc) != null
  }
}

class SplitRegionSpec extends AnyFunSuite {
  test("arraySplit matches np.array_split chunking") {
    assert(SplitRegion.arraySplit(Seq(1, 2, 3, 4, 5), 3) == Seq(Seq(1, 2), Seq(3, 4), Seq(5)))
    assert(SplitRegion.arraySplit(Seq(1, 2, 3), 3) == Seq(Seq(1), Seq(2), Seq(3)))
    assert(SplitRegion.arraySplit(Seq(1, 2, 3, 4, 5, 6, 7), 3) == Seq(Seq(1, 2, 3), Seq(4, 5), Seq(6, 7)))
  }
  test("two-column region splits into right (idx 0) / left (idx 1) hulls") {
    val doc = PagesFromDocuments.twoColumnDoc(0, (1 to 40).map("w" + _).mkString(" ")) // 5 chunks
    val groups = SplitRegion.split(doc.regions.head)
    assert(groups.size == 2)
    assert(groups(0).lines.size == 2 && groups(1).lines.size == 3) // right=floor, left=ceil
    assert(Geo.polygon(groups(1).ring).getArea.toLong == 300L * (60 * 2 + 50)) // left hull
    assert(Geo.polygon(groups(0).ring).getArea.toLong == 300L * (60 * 1 + 50)) // right hull
  }
  test("fewer than 3 lines or close columns yield the reference's empty result") {
    val doc = PagesFromDocuments.twoColumnDoc(0, (1 to 16).map("w" + _).mkString(" ")) // 2 chunks
    assert(SplitRegion.split(doc.regions.head).isEmpty)
    val clean = PagesFromDocuments.cleanDoc(0, (1 to 40).map("w" + _).mkString(" "))
    assert(SplitRegion.split(clean.regions.head).isEmpty) // all centers 500 -> distance 0 < 500
  }
}

class DehypheCorpusSpec extends AnyFunSuite {
  test("hyphenated corpus dehyphenates to the local transformation") {
    val text = (1 to 60).map("w" + _).mkString(" ") // 8 chunks: hyphens on 2, 5
    val doc = PagesFromDocuments.hyphenatedDoc(0, text)
    val got = pageplus.text.FullText.extract(doc, dehyphenate = true)
    val cs = PagesFromDocuments.lineTexts(text)
    val expected = cs.indices.map { i =>
      if (i % 3 == 2 && i < cs.size - 1) cs(i) + cs(i + 1).takeWhile(_ != ' ')
      else if (i % 3 == 0 && i > 0) {
        val rest = cs(i).dropWhile(_ != ' ')
        if (rest.isEmpty) "" else rest.tail
      } else cs(i)
    }.mkString("\n")
    assert(got == expected)
  }
}

class ValidateUpdateSpec extends AnyFunSuite {
  test("validate_baseline(update=True) persists ONLY the deduped original tuples") {
    val line = LineT("l", hasCoords = true,
      Seq(Pt(0, 0), Pt(100, 0), Pt(100, 50), Pt(0, 50)),
      hasBaseline = true,
      Seq(Pt(10, 40), Pt(10, 40), Pt(50, 40), Pt(50, 200)), // dup + point far outside
      Seq(TextEquivT(0, "t")), Nil, Seq("t"))
    val (updated, replaced, reports) = Validate.validateBaselineUpdate("u", line, "r")
    // persisted baseline = deduped original (the quirk), NOT the replacement
    assert(updated.baseline == Seq(Pt(10, 40), Pt(50, 40), Pt(50, 200)))
    // the computed (never persisted) replacement pulls the outside point to the polygon
    assert(replaced == Seq(Pt(10, 40), Pt(50, 40), Pt(50, 50)))
    assert(reports.map(_.rule) == Seq("baseline_pts_outside"))
  }
}

class BaselineOpsSpec extends AnyFunSuite {
  test("computeBaseline is the mrr midline ordered by y") {
    val bl = Baseline.computeBaseline(Seq(Pt(100, 100), Pt(900, 100), Pt(900, 150), Pt(100, 150)))
    assert(bl.map { case (x, y) => (x.toInt, y.toInt) } == Seq((100, 125), (900, 125)))
  }
  test("extendBaseline stretches to the polygon x-extent") {
    val line = PagesFromDocuments.cleanDoc(0, "a b").regions.head.lines.head
    assert(Baseline.extendBaseline(line).get == Seq(Pt(100, 140), Pt(900, 140)))
  }
  test("extendBaseline synthesizes from the polygon when baseline missing") {
    val line = PagesFromDocuments.cleanDoc(0, "a b").regions.head.lines.head
      .copy(hasBaseline = false, baseline = Nil)
    val bl = Baseline.extendBaseline(line).get
    assert(bl.head.x == 100 && bl.last.x == 900 && bl.head.y == 125) // midline y
  }
  test("pseudo literal raises like the reference's AttributeError") {
    intercept[Throwable](Baseline.pseudoPolygonLiteral(
      PagesFromDocuments.cleanDoc(0, "a").regions.head.lines.head))
  }
  test("placeOverBaseline centers x-extent with banker's rounding") {
    val line = LineT("l", hasCoords = true, Seq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10)),
      hasBaseline = true, Seq(Pt(5, 5), Pt(19, 5)), Seq(TextEquivT(0, "t")), Nil, Seq("t"))
    // xoff = ((5-0)+(19-10))/2 = 7
    assert(Baseline.placeOverBaseline(line).coords.head == Pt(7, 0))
  }
}
