package pageplus.ops

import pageplus.geo.Geo
import pageplus.model._

/** `modification repair` (cli/modification.py:32-57) as a pure
  * PageDoc => (PageDoc, Seq[Report]) transform. Per line:
  *   1. remove_repeated_points(tolerance=1) on the closed ring, write back
  *      through the dedup+unclose normalization;
  *   2. validate_region on the UPDATED coords; on failure fall back to the
  *      convex hull (degenerate hull raises, like shapely .exterior on a
  *      LineString, and is contained per line);
  *   3. validate_baseline check-only (update=False — the reference would
  *      persist only the deduped tuples even with update=True,
  *      models/text_elements.py:374).
  * Exceptions are contained per line (reference logs and continues); the
  * engine additionally emits a `hull_applied` info report for lineage.
  */
object Repair {

  def repairLine(url: String, line: LineT, parentId: String,
                 parentHasCoords: Boolean, parentCoords: Seq[Pt]): (LineT, Seq[Report]) = {
    val out = Seq.newBuilder[Report]
    var cur = line
    try {
      // step 1: remove repeated points (reference raises on missing/<3-pt coords)
      if (!cur.hasCoords || cur.coords.size < 3)
        throw new IllegalStateException("remove_repeated_points on missing/short coords")
      val cleaned = Geo.removeRepeatedPoints(PointCodec.closeRing(cur.coords), 1.0)
      cur = cur.copy(coords = PointCodec.dedupUnclose(cleaned))

      // step 2: validate_region on updated coords, hull fallback
      val (valid, regionReports) = Validate.validateRegion(url, cur, parentId, parentHasCoords, parentCoords)
      out ++= regionReports
      if (!valid) {
        val hull = Geo.convexHullExterior(cur.coords) // throws on degenerate hull / <3 pts
        cur = cur.copy(coords = PointCodec.dedupUnclose(hull))
        out += Report(url, cur.id, "hull_applied", "info", s"${cur.id}: coords replaced by convex hull")
      }

      // step 3: baseline check-only
      out ++= Validate.validateBaseline(url, cur, parentId)._3
      (cur, out.result())
    } catch {
      case e: Exception =>
        out += Report(url, line.id, "repair_error", "error",
          s"${line.id}: Error during repair - ${e.getMessage}")
        (cur, out.result())
    }
  }

  private def repairLines(url: String, parentId: String, parentHasCoords: Boolean,
                          parentCoords: Seq[Pt], lines: Seq[LineT]): (Seq[LineT], Seq[Report]) = {
    val out = Seq.newBuilder[Report]
    val repaired = lines.map { l =>
      val (nl, reps) = repairLine(url, l, parentId, parentHasCoords, parentCoords)
      out ++= reps
      nl
    }
    if (lines.isEmpty)
      out += Report(url, parentId, "empty_region", "info", s"$parentId: Region contains no text.")
    (repaired, out.result())
  }

  def page(doc: PageDoc): (PageDoc, Seq[Report]) = {
    if (!doc.parseOk)
      return (doc, Seq(Report(doc.url, "", "parse_error", "error", doc.parseError)))
    val out = Seq.newBuilder[Report]
    val regions = doc.regions.map { r =>
      if (r.kind == "table") {
        val cells = r.cells.map { c =>
          val (ls, reps) = repairLines(doc.url, c.id, c.hasCoords, c.coords, c.lines)
          out ++= reps
          c.copy(lines = ls)
        }
        r.copy(cells = cells)
      } else {
        val (ls, reps) = repairLines(doc.url, r.id, r.hasCoords, r.coords, r.lines)
        out ++= reps
        r.copy(lines = ls)
      }
    }
    (doc.copy(regions = regions), out.result())
  }
}
