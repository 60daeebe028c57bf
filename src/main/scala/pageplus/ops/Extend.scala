package pageplus.ops

import org.locationtech.jts.geom._

import pageplus.geo.Geo
import pageplus.model._

/** `_buffer` (basic_elements.py:332-372), `extend_lines`
  * (cli/modification.py:137-184) and the literal `split_overlapping_linearrings`
  * (basic_elements.py:204-252).
  */
object Extend {

  /** `_buffer(polygon, distance, direction, simplify, rectangle)`.
    * Input/output are ring point lists; int truncation happens at write time.
    * Note: buffering a closed ring buffers the CURVE (a donut), whose mrr is
    * still the grown rectangle — matching shapely. */
  def buffer(ringPts: Seq[Pt], distance: Double = 8, direction: String = "horizontal",
             simplify: Boolean = false, rectangle: Boolean = false): Seq[Pt] = {
    val ring = Geo.ring(ringPts)
    var padded: Geometry = if (distance != 0) Geo.bufferSquareBevel(ring, distance) else ring

    if (direction == "width" || direction == "horizontal") {
      // trimming branch — NOT on the extend_lines hot path (CLI passes "all",
      // cli/modification.py:174), implemented for API completeness
      val mrrScaled = Geo.scale(Geo.mrr(ring), 0.9, 0.9, useCentroid = false)
      val cs = mrrScaled.asInstanceOf[Polygon].getExteriorRing.getCoordinates
      val segs = (0 until cs.length - 1).map(i =>
        Geo.factory.createLineString(Array(cs(i), cs(i + 1))))
      val sorted = segs.sortBy(l =>
        if (direction == "width") l.getLength
        else math.abs(l.getCoordinateN(0).x - l.getCoordinateN(1).x))
      val scaledLines = sorted.map(l => Geo.scale(l, 10, 10, useCentroid = true).asInstanceOf[LineString])
      val upperLower = Geo.factory.createPolygon(
        (scaledLines(2).getCoordinates ++ scaledLines(3).getCoordinates :+ scaledLines(2).getCoordinates.head))
      padded = padded.intersection(upperLower)
      if (padded.isInstanceOf[GeometryCollection] && !padded.isInstanceOf[MultiPolygon])
        return ringPts
      val extensions = scaledLines.take(2).flatMap { l =>
        Geo.largestPolygon(padded) match {
          case Some(pp) => Geo.splitPolygon(pp, l).sortBy(_.getArea).headOption
          case None     => None
        }
      }
      try {
        var u: Geometry = Geo.polygon(ringPts)
        extensions.foreach(e => u = u.union(e))
        padded = u
      } catch { case _: Exception => return ringPts }
      padded = padded match {
        case mp: MultiPolygon => mp.convexHull()
        case p: Polygon       => p
        case other            => other
      }
    }

    if (rectangle) {
      return Geo.mrr(padded) match {
        case p: Polygon   => Geo.toPts(p.getExteriorRing.getCoordinates)
        case l: LineString => Geo.toPts(l.getCoordinates)
        case other        => Geo.toPts(other.getCoordinates)
      }
    }

    var result: Geometry = padded
    if (simplify) {
      result = Geo.simplify(result, 0.95)
      result = result.convexHull()
    }
    result match {
      case p: Polygon => Geo.orientCCWExterior(p)
      case l: LinearRing => Geo.toPts(l.getCoordinates)
      case l: LineString => Geo.toPts(l.getCoordinates)
      case other => Geo.toPts(other.getCoordinates)
    }
  }

  /** Literal `split_overlapping_linearrings`: the candidate point sets are ring
    * points that lie ON the other ring (shapely LinearRing.contains is curve
    * containment), so for generic overlapping shapes both sets are empty and the
    * rings come back unchanged — the engine reproduces exactly that. */
  def splitOverlappingRings(fst: Seq[Pt], snd: Seq[Pt]): (Seq[Pt], Seq[Pt]) = {
    try {
      val fstRing = Geo.ring(fst)
      val sndRing = Geo.ring(snd)
      // remove_repeated_points default tolerance=0: exact adjacent dups only
      def dedup(pts: Seq[Pt]) = PointCodec.closeRing(PointCodec.dedupUnclose(pts))
      val fstOn = dedup(fst).filter(p => sndRing.contains(Geo.point(p))).sortBy(_.x)
      val sndOn = dedup(snd).filter(p => fstRing.contains(Geo.point(p))).sortBy(_.x)
      if (fstOn.isEmpty || sndOn.isEmpty) return (fst, snd)

      def unclose(pts: Seq[Pt]) =
        if (pts.size > 1 && pts.head == pts.last) pts.dropRight(1) else pts
      val fstLs = unclose(fstOn)
      val sndLs = unclose(sndOn)

      // centerline between the two point chains (nearest-point midpoints)
      val (more, less) = if (fstLs.size > sndLs.size) (fstLs, sndLs) else (sndLs, fstLs)
      val lessLine = if (less.size >= 2) Geo.lineString(less) else null
      val center = more.map { p =>
        val pt = Geo.point(p)
        val nearest =
          if (lessLine != null)
            org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(pt, lessLine)(1)
          else Geo.coord(less.head)
        new Coordinate((p.x + nearest.x) / 2.0, (p.y + nearest.y) / 2.0)
      }
      // reference: fst_ls = LineString([fst_ls[0], *centerline, fst_ls[-1]]),
      // then split(Polygon(fst_lr), fst_ls) and keep the largest piece
      def cut(ringPts: Seq[Pt], chain: Seq[Pt]): Seq[Pt] = {
        val poly = Geo.polygon(ringPts)
        val cutLine = Geo.factory.createLineString(
          (Geo.coord(chain.head) +: center :+ Geo.coord(chain.last)).toArray)
        val pieces = Geo.splitPolygon(poly, cutLine).sortBy(-_.getArea)
        Geo.toPts(pieces.head.getExteriorRing.getCoordinates)
      }
      (cut(fst, fstLs), cut(snd, sndLs))
    } catch {
      case _: Exception => (fst, snd) // reference bare except -> unchanged
    }
  }

  /** `extend_lines` (cli/modification.py:166-179): per TEXT region line —
    * buffer(16, "all", rectangle=True), fit_into_parent, de-overlap vs the
    * predecessor; per-line error containment. */
  def extendLines(doc: PageDoc, cutOverlaps: Boolean = true): (PageDoc, Seq[Report]) = {
    if (!doc.parseOk)
      return (doc, Seq(Report(doc.url, "", "parse_error", "error", doc.parseError)))
    val out = Seq.newBuilder[Report]
    val regions = doc.regions.map { r =>
      if (r.kind != "text") r
      else {
        val lines = scala.collection.mutable.ArrayBuffer.from(r.lines)
        var idx = 0
        while (idx < lines.length) {
          val line = lines(idx)
          try {
            if (!line.hasCoords || line.coords.size < 3)
              throw new IllegalStateException("buffer on missing/short coords")
            var coords = PointCodec.dedupUnclose(buffer(line.coords, 16, "all", rectangle = true))
            // fit_into_parent: skip when parent Coords missing or the '0,0 0,0' sentinel
            if (r.hasCoords && PointCodec.format(r.coords) != "0,0 0,0")
              coords = PointCodec.dedupUnclose(Geo.fitFirstIntoSecond(coords, r.coords))
            lines(idx) = line.copy(coords = coords)
            if (cutOverlaps && idx > 0) {
              val pred = lines(idx - 1)
              val (predCoords, curCoords) =
                splitOverlappingRings(pred.coords, lines(idx).coords)
              lines(idx) = lines(idx).copy(coords = PointCodec.dedupUnclose(curCoords))
              lines(idx - 1) = pred.copy(coords = PointCodec.dedupUnclose(predCoords))
            }
          } catch {
            case e: Exception =>
              out += Report(doc.url, line.id, "extend_error", "error",
                s"Error processing line ${line.id}: ${e.getMessage}")
          }
          idx += 1
        }
        r.copy(lines = lines.toSeq)
      }
    }
    (doc.copy(regions = regions), out.result())
  }
}
