package pageplus.ops

import org.locationtech.jts.geom.{Polygon, TopologyException}

import pageplus.geo.Geo
import pageplus.model._
import pageplus.ops.Delete.recomputeUnicodes

/** `merge_splitted_lines` (models/text_elements.py:138-207) and the
  * `sort_and_merge` pipeline (cli/modification.py:223-259).
  *
  * The merge is an inherently sequential left fold per region (each decision
  * depends on prior merges), so it stays inside the row's computation
  * (SURVEY §7.4.6) — never a window function.
  *
  * `sort_lines` is a literal behavioral no-op on the document (its guard
  * `len(tuple) < 3` is always true and nothing is written back,
  * models/text_elements.py:116,99-135) — reproduced as identity; the *intended*
  * top-to-bottom sort is exposed separately as [[sortLinesIntended]].
  */
object Merge {

  /** Literal sort_lines: identity. */
  def sortLines(region: RegionT): RegionT = region

  /** Intended (opt-in) variant: sort lines by mrr centroid y. */
  def sortLinesIntended(region: RegionT): RegionT = {
    val sorted = region.lines.sortBy { l =>
      if (l.hasCoords && l.coords.size >= 3)
        Geo.mrr(Geo.polygon(l.coords)).getCentroid.getY
      else Double.MaxValue
    }
    region.copy(lines = sorted)
  }

  /** sort_baselines (models/text_elements.py:51-96) is DEAD CODE in the
    * reference: no CLI calls it and `_baselines_near_same_height` passes `x=`
    * to affinity.translate, raising TypeError on first use. This is the
    * INTENDED semantics (sans crash): initial sort by baseline centroid y
    * (synthesized from the polygon when missing), then the literal bubble pass
    * — lines "near the same height" (x-aligned buffered baselines intersect)
    * are swapped UNCONDITIONALLY (the `_should_swap` check only gates a log
    * line, models/text_elements.py:75-77). */
  def sortBaselinesIntended(region: RegionT, tolerance: Double = 5.0): RegionT = {
    val entries = region.lines.zipWithIndex.flatMap { case (l, idx) =>
      val bl: Option[Seq[(Double, Double)]] =
        if (l.hasBaseline && l.baseline.size >= 2)
          Some(l.baseline.map(p => (p.x.toDouble, p.y.toDouble)))
        else if (l.hasCoords && l.coords.size >= 3)
          Some(pageplus.ops.Baseline.computeBaseline(l.coords))
        else None
      bl.map(b => (idx, b))
    }
    if (entries.size != region.lines.size) return region // a line had no geometry: keep order
    val sorted = scala.collection.mutable.ArrayBuffer.from(
      entries.sortBy { case (_, b) => b.map(_._2).sum / b.size }) // centroid y of the polyline pts
    var i = 0
    while (i < sorted.length - 1) {
      var j = i + 1
      while (j < sorted.length) {
        val b1 = sorted(i)._2
        val b2 = sorted(j)._2
        // near same height: translate b2's x so centroids align, buffered intersect
        val c1x = b1.map(_._1).sum / b1.size
        val c2x = b2.map(_._1).sum / b2.size
        val shift = c1x - c2x
        val l1 = Geo.lineString(b1.map { case (x, y) => Pt(x.toInt, y.toInt) })
        val l2 = Geo.lineString(b2.map { case (x, y) => Pt((x + shift).toInt, y.toInt) })
        if (l1.buffer(tolerance).intersects(l2.buffer(tolerance))) {
          val t = sorted(i); sorted(i) = sorted(j); sorted(j) = t // unconditional swap
        }
        j += 1
      }
      i += 1
    }
    region.copy(lines = sorted.map { case (idx, _) => region.lines(idx) }.toSeq)
  }

  private def canMerge(prev: Seq[Pt], cur: Seq[Pt], maxX: Int, maxY: Int): Boolean =
    prev.nonEmpty && cur.nonEmpty &&
      math.abs(prev.last.x - cur.head.x) <= maxX &&
      math.abs(prev.last.y - cur.head.y) <= maxY

  /** _merge_line_polygons_and_baselines + _calculate_bridge_region +
    * _unify_polygons (models/text_elements.py:175-207). Throws on geometry
    * conflicts; caller skips the pair like the reference's GEOSException catch. */
  private def mergePair(prev: LineT, cur: LineT, prevBl: Seq[Pt], curBl: Seq[Pt]): (Seq[Pt], Seq[Pt]) = {
    def mrrSides(l: LineT): Seq[Double] = {
      val rect = Geo.mrr(Geo.polygon(l.coords))
      rect match {
        case p: Polygon =>
          val cs = p.getExteriorRing.getCoordinates
          (0 until cs.length - 1).map(i => cs(i).distance(cs(i + 1)))
        case _ => Seq(0.0, 0.0, 0.0, 0.0)
      }
    }
    val widths = mrrSides(prev) ++ mrrSides(cur)
    val meanWidth = Geo.median(widths)
    val margin = (meanWidth * 0.75).toInt // int() truncation (models/text_elements.py:197-198)
    val bridgeCoords =
      prev.coords.filter(_.x > prevBl.last.x - margin) ++
      cur.coords.filter(_.x < curBl.head.x + margin)
    // concave_hull(Polygon(...), ratio=1.0) == convex hull
    val bridge = Geo.polygon(bridgeCoords).convexHull()
    val unified = Geo.polygon(prev.coords).union(bridge).union(Geo.polygon(cur.coords))
    val newPoly = unified match {
      case p: Polygon => p
      case other => throw new TopologyException(s"union produced ${other.getGeometryType}")
    }
    (Geo.toPts(newPoly.getExteriorRing.getCoordinates), prevBl ++ curBl)
  }

  /** update_text(text, index=0): set the Unicode of the TextEquiv whose index
    * matches (models/text_elements.py:303-312); silently nothing if absent. */
  def updateText(line: LineT, text: String, index: Int = 0): LineT =
    recomputeUnicodes(line.copy(texts =
      line.texts.map(t => if (t.index == index) t.copy(unicode = text) else t)))

  def mergeSplittedLines(region: RegionT, maxXDiff: Int = 64, maxYDiff: Int = 12): (RegionT, Seq[Report]) = {
    val reports = Seq.newBuilder[Report]
    val lines = scala.collection.mutable.ArrayBuffer.from(region.lines)
    val baselines = scala.collection.mutable.ArrayBuffer.from(
      region.lines.map(l => if (l.hasBaseline) l.baseline else Nil))
    var i = 1
    while (i < lines.length) {
      val cur = baselines(i)
      val prev = baselines(i - 1)
      if (canMerge(prev, cur, maxXDiff, maxYDiff)) {
        try {
          val (newPoly, newBl) = mergePair(lines(i - 1), lines(i), prev, cur)
          val prevText = Option(lines(i - 1).getText).getOrElse("None")
          val curText = Option(lines(i).getText).getOrElse("None")
          lines(i) = updateText(
            lines(i).copy(
              coords = PointCodec.dedupUnclose(newPoly),
              hasBaseline = true,
              baseline = newBl),
            s"$prevText $curText")
          lines.remove(i - 1)
          baselines(i) = newBl
          baselines.remove(i - 1)
        } catch {
          case e: Exception =>
            reports += Report("", lines(i).id, "merge_conflict", "warning",
              s"A conflict occurred while merging lines ${lines(i - 1).id} and ${lines(i).id}: ${e.getMessage}")
            i += 1
        }
      } else i += 1
    }
    (region.copy(lines = lines.toSeq), reports.result())
  }

  /** sort_and_merge pipeline: sort_lines (no-op) then merge, TEXT regions only
    * (cli/modification.py:244-248). */
  def sortAndMerge(doc: PageDoc, gapX: Int = 64, gapY: Int = 10): (PageDoc, Seq[Report]) = {
    if (!doc.parseOk)
      return (doc, Seq(Report(doc.url, "", "parse_error", "error", doc.parseError)))
    val out = Seq.newBuilder[Report]
    val regions = doc.regions.map { r =>
      if (r.kind != "text") r
      else {
        val (merged, reps) = mergeSplittedLines(sortLines(r), gapX, gapY)
        out ++= reps.map(_.copy(url = doc.url))
        merged
      }
    }
    (doc.copy(regions = regions), out.result())
  }
}
