package graft

import org.scalatest.funsuite.AnyFunSuite

import pageplus.data.PagesFromDocuments
import pageplus.geo.Geo
import pageplus.ops.{Baseline, Extend, Repair, Validate}

/** Pins the adversarial-geometry family's outcomes (the constants the
  * *_messy oracles encode). Each assertion is derived analytically in the
  * comment; JTS arithmetic is deterministic, so these are stable pins, not
  * snapshots of convenience. */
class MessySpec extends AnyFunSuite {
  private val text = (1 to 40).map("w" + _).mkString(" ") // 5 lines
  private def doc(m: Int) = PagesFromDocuments.messyDoc(70L + m, text) // 70 % 7 == 0

  private def line0(d: pageplus.model.PageDoc) = d.textRegions.head.lines.head

  test("validate: only bow-tie and collinear classes report, with the pinned rules") {
    val byM = (0 to 6).map(m => m -> Validate.page(doc(m)).map(r => (r.elementId, r.rule))).toMap
    assert(byM(3) == Seq(("r0l0", "ring_not_valid"), ("r0l0", "baseline_pts_outside")))
    assert(byM(4) == Seq(("r0l0", "ring_not_valid"), ("r0l0", "baseline_outside")))
    Seq(0, 1, 2, 5, 6).foreach(m => assert(byM(m).isEmpty, s"m=$m"))
  }

  test("repair: hull on the bow-tie, contained error on the degenerate hull, dedup on stutter") {
    val byM = (0 to 6).map(m => m -> Repair.page(doc(m))).toMap
    assert(byM(3)._2.map(_.rule) == Seq("ring_not_valid", "hull_applied"))
    assert(byM(4)._2.map(_.rule) == Seq("ring_not_valid", "repair_error"))
    Seq(0, 1, 2, 5, 6).foreach(m => assert(byM(m)._2.isEmpty, s"m=$m"))
    // areas: bite-concave 40000-200*20; rotated 120x50; bow-tie hull = bbox;
    // collinear stays degenerate (zero area); stutter dedups to the 4 corners
    assert(line0(byM(1)._1).coords.size == 8 && Geo.polygon(line0(byM(1)._1).coords).getArea == 36000.0)
    assert(Geo.polygon(line0(byM(2)._1).coords).getArea == 6000.0)
    assert(line0(byM(3)._1).coords.size == 4 && Geo.polygon(line0(byM(3)._1).coords).getArea == 40000.0)
    assert(Geo.polygon(line0(byM(4)._1).coords).getArea == 0.0)
    assert(line0(byM(5)._1).coords == Seq(pageplus.model.Pt(100, 100), pageplus.model.Pt(900, 100),
      pageplus.model.Pt(900, 150), pageplus.model.Pt(100, 150)))
  }

  test("extend: MultiPolygon fit keeps the larger piece of the U-notched parent") {
    // grown bar 84..916 x 984..1066 minus the notch column 400..500 ->
    // pieces 316x82 and 416x82; the larger (right) survives: area 34112
    val (d6, reps) = Extend.extendLines(doc(6))
    assert(reps.isEmpty)
    val rx = d6.textRegions.find(_.id == "rx").get.lines.head
    val poly = Geo.polygon(rx.coords)
    assert(poly.getArea == 416.0 * 82.0)
    val sides = Geo.sideLengths(Geo.mrr(poly))
    assert(sides.head.toLong == 82 && sides.last.toLong == 416)
  }

  test("extend: pinned constants for rotated / bow-tie / collinear line 0") {
    def ext(m: Int) = {
      val l = Extend.extendLines(doc(m))._1.textRegions.head.lines.head
      val poly = Geo.polygon(l.coords)
      val sides = Geo.sideLengths(Geo.mrr(poly))
      (poly.getArea.toLong, sides.head.toLong, sides.last.toLong)
    }
    assert(ext(2) == ((12511L, 82L, 152L))) // rotated 120x50 + 16 buffer: ~152x82 with bevels
    assert(ext(3) == ((65682L, 82L, 801L))) // bow-tie curve buffer mrr
    assert(ext(4) == ((25600L, 32L, 800L))) // collinear curve buffer: 800x32
    // the concave bite vanishes under buffer+mrr: same as a clean first line
    assert(ext(1) == ((59072L, 71L, 832L)))
  }

  test("extend_baseline: rotated-edge intersections and degenerate-mrr synthesis") {
    import pageplus.model.Pt
    // m=2: startProbe y=115 hits edge D-A at x = 170 + (120-115)/40*30 = 173.75 -> 173;
    //      endProbe y=157 hits edge B-C at x = 296 - (157-152)/40*30 = 292.25 -> 292
    assert(Baseline.extendBaseline(line0(doc(2))).get == Seq(Pt(173, 115), Pt(292, 157)))
    // m=4: baseline disjoint from the zero-area ring -> synthesized from the
    // DEGENERATE mrr (a LineString along y=100, models/text_elements.py:393-396)
    assert(Baseline.extendBaseline(line0(doc(4))).get == Seq(Pt(100, 100), Pt(900, 100)))
    // m=3: the invalid bow-tie still extends to the bbox x-extent
    assert(Baseline.extendBaseline(line0(doc(3))).get == Seq(Pt(100, 140), Pt(900, 140)))
  }
}
