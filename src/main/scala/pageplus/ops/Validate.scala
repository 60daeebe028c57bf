package pageplus.ops

import org.locationtech.jts.geom.TopologyException

import pageplus.geo.Geo
import pageplus.model._

/** `validation validate-all` (cli/validation.py:34-53) as a pure
  * PageDoc => Seq[Report] — the reference's log-as-output becomes a first-class
  * report table (SURVEY §3.3). Rule strings are stable identifiers used by the
  * DuckDB oracles.
  */
object Validate {

  /** The reference's adjacent-duplicate baseline dedup (shared by the
    * check-only and update paths — one definition, no drift). */
  private def dedupAdjacent(b: Seq[Pt]): Seq[Pt] =
    b.head +: b.zip(b.tail).collect { case (prev, cur) if cur != prev => cur }


  /** validate_text (basic_elements.py:133-138). */
  def validateText(url: String, line: LineT, parentId: String): Option[Report] =
    if (line.isTextEmpty)
      Some(Report(url, line.id, "text_empty", "warning", s"$parentId: Text is empty."))
    else None

  /** validate_region on a textline (basic_elements.py:163-192): parent is the
    * enclosing region/cell (structural, no DOM walk needed). */
  def validateRegion(url: String, line: LineT, parentId: String,
                     parentHasCoords: Boolean, parentCoords: Seq[Pt]): (Boolean, Seq[Report]) = {
    val coords = if (line.hasCoords) line.coords else Nil
    if (coords.isEmpty || coords.size < 4)
      return (false, Seq(Report(url, line.id, "insufficient_points", "warning",
        s"${line.id}: Region is missing or has insufficient coord points.")))
    val (valid, reason) = Geo.ringValidWithReason(coords)
    if (!valid)
      return (false, Seq(Report(url, line.id, "ring_not_valid", "warning",
        s"${line.id}: Region is not valid. Error: $reason")))
    if (parentHasCoords) {
      if (parentCoords.size <= 2)
        return (false, Seq(Report(url, parentId, "parent_insufficient_points", "warning",
          s"$parentId: Parent region has insufficient coord points.")))
      val parentPoly = Geo.polygon(parentCoords)
      val regionRing = Geo.ring(coords)
      if (!parentPoly.isValid || regionRing.disjoint(parentPoly))
        return (false, Seq(Report(url, line.id, "region_invalid_or_outside", "warning",
          s"${line.id}: Region is invalid or outside of the parent region.")))
    }
    (true, Nil)
  }

  /** validate_baseline(update=false) (models/text_elements.py:315-375). Returns
    * (valid, dedupedBaseline, reports); throws like the reference when the
    * textline has no usable polygon (None.intersects -> AttributeError), to be
    * caught by the per-line containment. */
  def validateBaseline(url: String, line: LineT, parentId: String): (Boolean, Seq[Pt], Seq[Report]) = {
    if (!line.hasBaseline || line.baseline.isEmpty)
      return (false, Nil, Seq(Report(url, line.id, "baseline_missing", "warning",
        s"${line.id}: Missing baseline")))
    val deduped = dedupAdjacent(line.baseline)
    if (deduped.size == 1)
      return (false, deduped, Seq(Report(url, line.id, "baseline_one_point", "warning",
        s"${line.id}: Baseline has just one point")))
    try {
      if (!line.hasCoords || line.coords.size < 3)
        throw new IllegalStateException("textline polygon unavailable") // reference: AttributeError on None
      val poly = Geo.polygon(line.coords)
      val bl = Geo.lineString(deduped)
      if (!poly.intersects(bl))
        return (false, deduped, Seq(Report(url, line.id, "baseline_outside", "warning",
          s"${line.id}: Baseline is outside of the textregion $parentId.")))
      val outside = deduped.filterNot(p => poly.covers(Geo.point(p)))
      if (outside.nonEmpty)
        return (false, deduped, Seq(Report(url, line.id, "baseline_pts_outside", "warning",
          s"${line.id}: Some points of the baseline are outside of the textregion $parentId. Points outside $outside")))
      (true, deduped, Nil)
    } catch {
      case _: TopologyException =>
        (false, deduped, Seq(Report(url, line.id, "baseline_or_parent_invalid", "warning",
          s"${line.id}: Baseline or parentregion $parentId is invalid.")))
    }
  }

  /** validate_baseline(update=True): computes nearest-point replacements for
    * points outside the polygon, but PERSISTS ONLY THE DEDUPED ORIGINAL tuples
    * — the reference writes `baseline_tuples`, not `new_baseline_tuples`
    * (models/text_elements.py:374). The computed replacement is returned for
    * the opt-in intended behavior. Persist happens only when the checks get
    * past the early-return failures. */
  def validateBaselineUpdate(url: String, line: LineT, parentId: String): (LineT, Seq[Pt], Seq[Report]) = {
    if (!line.hasBaseline || line.baseline.isEmpty)
      return (line, Nil, Seq(Report(url, line.id, "baseline_missing", "warning", s"${line.id}: Missing baseline")))
    val deduped = dedupAdjacent(line.baseline)
    if (deduped.size == 1)
      return (line, Nil, Seq(Report(url, line.id, "baseline_one_point", "warning", s"${line.id}: Baseline has just one point")))
    try {
      if (!line.hasCoords || line.coords.size < 3)
        throw new IllegalStateException("textline polygon unavailable")
      val poly = Geo.polygon(line.coords)
      if (!poly.intersects(Geo.lineString(deduped)))
        return (line, Nil, Seq(Report(url, line.id, "baseline_outside", "warning",
          s"${line.id}: Baseline is outside of the textregion $parentId.")))
      // compute the intended replacement (returned, never persisted — parity)
      val replaced = Seq.newBuilder[Pt]
      var prevKept: Option[Pt] = None
      val reports = Seq.newBuilder[Report]
      var anyOutside = false
      deduped.zipWithIndex.foreach { case (p, idx) =>
        var point = p
        if (!poly.covers(Geo.point(p))) {
          anyOutside = true
          val ptDist = poly.distance(Geo.point(p))
          val predDist = prevKept.map(q => Geo.point(q).distance(Geo.point(p))).getOrElse(Double.PositiveInfinity)
          val succDist = if (idx != deduped.size - 1)
            Geo.point(deduped(idx + 1)).distance(Geo.point(p)) else Double.PositiveInfinity
          if (ptDist < predDist && ptDist < succDist) {
            val nearest = org.locationtech.jts.operation.distance.DistanceOp
              .nearestPoints(Geo.point(p), poly)(1)
            point = Pt(nearest.x.toInt, nearest.y.toInt)
          }
        }
        replaced += point
        prevKept = Some(point)
      }
      if (anyOutside)
        reports += Report(url, line.id, "baseline_pts_outside", "warning",
          s"${line.id}: Some points of the baseline are outside of the textregion $parentId.")
      // literal persist: the deduped ORIGINAL tuples
      (line.copy(baseline = deduped), replaced.result(), reports.result())
    } catch {
      case _: org.locationtech.jts.geom.TopologyException =>
        (line, Nil, Seq(Report(url, line.id, "baseline_or_parent_invalid", "warning",
          s"${line.id}: Baseline or parentregion $parentId is invalid.")))
    }
  }

  private def validateLines(url: String, parentId: String, parentHasCoords: Boolean,
                            parentCoords: Seq[Pt], lines: Seq[LineT]): Seq[Report] = {
    val out = Seq.newBuilder[Report]
    lines.foreach { line =>
      try {
        out ++= validateText(url, line, parentId)
        out ++= validateRegion(url, line, parentId, parentHasCoords, parentCoords)._2
        out ++= validateBaseline(url, line, parentId)._3
      } catch {
        case e: Exception =>
          out += Report(url, line.id, "validation_error", "error",
            s"${line.id}: Error during validation - ${e.getMessage}")
      }
    }
    if (lines.isEmpty)
      out += Report(url, parentId, "empty_region", "info", s"$parentId: Region contains no text.")
    out.result()
  }

  /** Full page validation: text regions, then table cells (cli/validation.py:62-68). */
  def page(doc: PageDoc): Seq[Report] = {
    if (!doc.parseOk)
      return Seq(Report(doc.url, "", "parse_error", "error", doc.parseError))
    val out = Seq.newBuilder[Report]
    doc.textRegions.foreach { r =>
      out ++= validateLines(doc.url, r.id, r.hasCoords, r.coords, r.lines)
    }
    doc.tableRegions.foreach { t =>
      t.cells.foreach { c =>
        out ++= validateLines(doc.url, c.id, c.hasCoords, c.coords, c.lines)
      }
    }
    out.result()
  }
}
