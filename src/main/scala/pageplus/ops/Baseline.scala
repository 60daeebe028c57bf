package pageplus.ops

import org.locationtech.jts.geom._
import org.locationtech.jts.operation.distance.DistanceOp

import pageplus.geo.Geo
import pageplus.model._

/** Baseline geometry operators (models/text_elements.py:377-501):
  * `_compute_baseline`, `find_nearest_intersection_polygon_linestring`,
  * `extend_baseline`, `place_textlinepolygon_over_baseline`, translations and
  * the pseudo-textline polygon (literal + intended modes).
  */
object Baseline {

  /** _compute_baseline: mrr -> midpoints of the two SHORTEST sides, ordered by
    * rounded mean y — the midline of the box (models/text_elements.py:377-396).
    * Degenerate mrr (LineString) returned as-is. */
  def computeBaseline(coords: Seq[Pt]): Seq[(Double, Double)] = {
    val rect = Geo.mrr(Geo.polygon(coords))
    rect match {
      case ls: LineString =>
        ls.getCoordinates.toSeq.map(c => (c.x, c.y))
      case p: Polygon =>
        val cs = p.getExteriorRing.getCoordinates
        val segs = (0 until cs.length - 1).map(i => (cs(i), cs(i + 1)))
        val shortest2 = segs.sortBy { case (a, b) => a.distance(b) }.take(2)
        // Python: sorted(..., key=round((y1+y2)/2)) — stable on the rounded key
        val ordered = shortest2.sortBy { case (a, b) => math.round((a.y + b.y) / 2.0) }
        ordered.map { case (a, b) => ((a.x + b.x) / 2.0, (a.y + b.y) / 2.0) }
      case other =>
        other.getCoordinates.toSeq.map(c => (c.x, c.y))
    }
  }

  /** find_nearest_intersection_polygon_linestring (models/text_elements.py:398-419). */
  def nearestIntersection(polygon: Polygon, line: LineString, poi: (Double, Double)): (Int, Int) = {
    val fallback = (poi._1.toInt, poi._2.toInt)
    try {
      val inter = polygon.intersection(line)
      if (inter.isEmpty) return fallback
      inter.getGeometryType match {
        case "Point" | "MultiPoint" | "LineString" =>
          val poiPt = Geo.factory.createPoint(new Coordinate(poi._1, poi._2))
          val nearest = DistanceOp.nearestPoints(poiPt, inter)(1)
          (nearest.x.toInt, nearest.y.toInt)
        case _ =>
          val poiPt = new Coordinate(poi._1, poi._2)
          val first = (0 until inter.getNumGeometries)
            .map(i => inter.getGeometryN(i).getCoordinates.head)
            .minBy(_.distance(poiPt))
          (first.x.toInt, first.y.toInt)
      }
    } catch { case _: Exception => fallback }
  }

  /** extend_baseline(create_missing=True): stretch the baseline to the textline
    * bbox x-extent via nearest-intersection probes; interior points kept only if
    * inside the mrr; synthesize from the polygon when missing/disjoint
    * (models/text_elements.py:464-501). Returns the new baseline, or None when
    * the reference would leave the element untouched. */
  def extendBaseline(line: LineT, createMissing: Boolean = true): Option[Seq[Pt]] = {
    if (!line.hasCoords || line.coords.size < 3) return None
    try {
      val poly = Geo.polygon(line.coords)
      val blOpt =
        if (line.hasBaseline && line.baseline.nonEmpty) Some(Geo.lineString(line.baseline)) else None
      val needsSynth = blOpt.isEmpty || !poly.intersects(blOpt.get)
      if (needsSynth && !createMissing && blOpt.isEmpty) return None
      val baselineCoords: Seq[(Double, Double)] =
        if (needsSynth) computeBaseline(line.coords)
        else line.baseline.map(p => (p.x.toDouble, p.y.toDouble))
      if (baselineCoords.isEmpty) return None
      val env = poly.getEnvelopeInternal
      val first = baselineCoords.head
      val last = baselineCoords.last
      val startProbe = Geo.factory.createLineString(Array(
        new Coordinate(env.getMinX, first._2), new Coordinate(first._1, first._2)))
      val endProbe = Geo.factory.createLineString(Array(
        new Coordinate(env.getMaxX, last._2), new Coordinate(last._1, last._2)))
      val startPt = nearestIntersection(poly, startProbe, (env.getMinX, first._2))
      val endPt = nearestIntersection(poly, endProbe, (env.getMaxX, last._2))
      val mrrPoly = Geo.mrr(poly)
      val interior = baselineCoords.drop(1).dropRight(1).filter { case (x, y) =>
        mrrPoly match {
          case p: Polygon => p.contains(Geo.factory.createPoint(new Coordinate(x, y)))
          case _          => false
        }
      }.map { case (x, y) => Pt(x.toInt, y.toInt) }
      Some((Pt(startPt._1, startPt._2) +: interior) :+ Pt(endPt._1, endPt._2))
    } catch {
      case _: TopologyException => None // reference logs "could not be extended"
    }
  }

  /** place_textlinepolygon_over_baseline(mode="x"): x-shift the polygon so its
    * x-extent centers on the baseline's (models/text_elements.py:421-436).
    * Python round() is banker's rounding — matched with RoundingMode.HALF_EVEN. */
  def placeOverBaseline(line: LineT): LineT = {
    if (!line.hasCoords || line.coords.size < 3 || !line.hasBaseline || line.baseline.isEmpty) return line
    val ringEnv = Geo.ring(line.coords).getEnvelopeInternal
    val blEnv = Geo.lineString(line.baseline).getEnvelopeInternal
    val xoffD = ((blEnv.getMinX - ringEnv.getMinX) + (blEnv.getMaxX - ringEnv.getMaxX)) / 2.0
    val xoff = java.math.BigDecimal.valueOf(xoffD)
      .setScale(0, java.math.RoundingMode.HALF_EVEN).intValue()
    line.copy(coords = PointCodec.dedupUnclose(
      PointCodec.closeRing(line.coords).map(p => Pt(p.x + xoff, p.y))))
  }

  /** translate_textlinepolygon / translate_baseline (models/text_elements.py:439-453). */
  def translatePolygon(line: LineT, xoff: Int, yoff: Int): LineT =
    if (!line.hasCoords) line
    else line.copy(coords = PointCodec.dedupUnclose(line.coords.map(p => Pt(p.x + xoff, p.y + yoff))))

  def translateBaseline(line: LineT, xoff: Int, yoff: Int): LineT =
    if (!line.hasBaseline) line
    else line.copy(baseline = line.baseline.map(p => Pt(p.x + xoff, p.y + yoff)))

  /** compute_pseudotextlinepolygon: BROKEN in the reference (calls nonexistent
    * self.baseline_coords -> AttributeError on every call,
    * models/text_elements.py:455-462). Literal mode: throw, like the reference. */
  def pseudoPolygonLiteral(line: LineT, buffersize: Int = 1): LineT =
    throw new NoSuchMethodError("'Textline' object has no attribute 'baseline_coords'")

  /** The INTENDED op (SURVEY §2.6): baseline.buffer(size).mrr -> polygon. */
  def pseudoPolygonIntended(line: LineT, buffersize: Int = 1): LineT = {
    if (!line.hasBaseline || line.baseline.size < 2) return line
    val buffered = Geo.lineString(line.baseline).buffer(buffersize)
    Geo.mrr(buffered) match {
      case p: Polygon =>
        line.copy(hasCoords = true,
          coords = PointCodec.dedupUnclose(Geo.toPts(p.getExteriorRing.getCoordinates)))
      case _ => line
    }
  }

  /** `pseudolinepolygon` CLI literal semantics (cli/modification.py:202-216):
    * sort_lines no-op, then every line raises inside the per-line try ->
    * error report per line, document unchanged. */
  def pseudoLinePolygonLiteral(doc: PageDoc): (PageDoc, Seq[Report]) = {
    val reports = doc.textRegions.flatMap(_.lines.map(l =>
      Report(doc.url, l.id, "pseudo_error", "error",
        s"Error processing line ${l.id}: 'Textline' object has no attribute 'baseline_coords'")))
    (doc, reports)
  }

  /** The intended pseudolinepolygon pipeline, behind a flag (SURVEY §2.8):
    * pseudo-polygon(16) -> baseline y+10 -> fit into parent -> extend baseline. */
  def pseudoLinePolygonIntended(doc: PageDoc): (PageDoc, Seq[Report]) = {
    val out = Seq.newBuilder[Report]
    val regions = doc.regions.map { r =>
      if (r.kind != "text") r
      else r.copy(lines = r.lines.map { l0 =>
        try {
          var l = pseudoPolygonIntended(l0, 16)
          l = translateBaseline(l, 0, 10)
          if (r.hasCoords && PointCodec.format(r.coords) != "0,0 0,0" && l.hasCoords && l.coords.size >= 3)
            l = l.copy(coords = PointCodec.dedupUnclose(Geo.fitFirstIntoSecond(l.coords, r.coords)))
          extendBaseline(l) match {
            case Some(bl) if bl.nonEmpty => l.copy(hasBaseline = true, baseline = bl)
            case _                       => l
          }
        } catch {
          case e: Exception =>
            out += Report(doc.url, l0.id, "pseudo_error", "error", s"${l0.id}: ${e.getMessage}")
            l0
        }
      })
    }
    (doc.copy(regions = regions), out.result())
  }
}
