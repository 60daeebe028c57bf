package pageplus.geo

import org.locationtech.jts.algorithm.MinimumDiameter
import org.locationtech.jts.geom._
import org.locationtech.jts.operation.buffer.{BufferOp, BufferParameters}
import org.locationtech.jts.operation.valid.IsValidOp
import org.locationtech.jts.simplify.DouglasPeuckerSimplifier

import pageplus.model.{PointCodec, Pt}

/** JTS helpers mirroring the reference's shapely surface (SURVEY §2.5-2.6).
  * JTS is GEOS's Java ancestor, so the operations match semantically; where
  * vertex ORDER may differ (hulls, buffers) only text-invariant outputs rely
  * on it (SURVEY §7.4.2).
  */
object Geo {

  val factory = new GeometryFactory()

  def coord(p: Pt): Coordinate = new Coordinate(p.x, p.y)

  def toPts(cs: Array[Coordinate]): Seq[Pt] =
    cs.iterator.map(c => Pt(c.x.toInt, c.y.toInt)).toSeq // int() truncation

  /** shapely Polygon(coord_tuples): auto-closes, needs >=3 points (else raises). */
  def polygon(pts: Seq[Pt]): Polygon = {
    require(pts.size >= 3, s"polygon needs >=3 points, got ${pts.size}")
    val closed = PointCodec.closeRing(pts)
    factory.createPolygon(closed.map(coord).toArray)
  }

  /** shapely LinearRing(coord_tuples): auto-closes, needs >=3 distinct points. */
  def ring(pts: Seq[Pt]): LinearRing = {
    require(pts.size >= 3, s"ring needs >=3 points, got ${pts.size}")
    val closed = PointCodec.closeRing(pts)
    factory.createLinearRing(closed.map(coord).toArray)
  }

  def lineString(pts: Seq[Pt]): LineString =
    factory.createLineString(pts.map(coord).toArray)

  def point(p: Pt): Point = factory.createPoint(coord(p))

  /** LinearRing validity + reason, like shapely is_valid / is_valid_reason
    * (basic_elements.py:172-178). JTS phrases self-intersection as
    * "Ring Self-intersection" too (IsValidOp.TopologyValidationError). */
  def ringValidWithReason(pts: Seq[Pt]): (Boolean, String) = {
    val r =
      try ring(pts)
      catch { case e: IllegalArgumentException => return (false, s"invalid ring: ${e.getMessage}") }
    val op = new IsValidOp(r)
    if (op.isValid) (true, "Valid Geometry")
    else (false, op.getValidationError.getMessage)
  }

  def polygonValid(pts: Seq[Pt]): Boolean =
    try new IsValidOp(polygon(pts)).isValid
    catch { case _: IllegalArgumentException => false }

  /** minimum_rotated_rectangle. */
  def mrr(g: Geometry): Geometry = MinimumDiameter.getMinimumRectangle(g)

  /** Sorted side lengths of a rectangle polygon's 4 exterior segments. */
  def sideLengths(rect: Geometry): Seq[Double] = rect match {
    case p: Polygon =>
      val cs = p.getExteriorRing.getCoordinates
      (0 until cs.length - 1).map(i => cs(i).distance(cs(i + 1))).sorted
    case l: LineString =>
      Seq(0.0, l.getLength)
    case _ => Seq(0.0, 0.0)
  }

  /** shapely buffer(distance, cap_style="square", join_style="bevel"),
    * default 8 quadrant segments (basic_elements.py:339). */
  def bufferSquareBevel(g: Geometry, distance: Double): Geometry = {
    val params = new BufferParameters(8, BufferParameters.CAP_SQUARE, BufferParameters.JOIN_BEVEL,
      BufferParameters.DEFAULT_MITRE_LIMIT)
    BufferOp.bufferOp(g, distance, params)
  }

  /** Douglas-Peucker simplify (basic_elements.py:299-305). */
  def simplify(g: Geometry, tolerance: Double): Geometry =
    DouglasPeuckerSimplifier.simplify(g, tolerance)

  /** shapely remove_repeated_points(ring, tolerance): keep the first point of
    * each run, drop subsequent points within `tolerance` of the last KEPT point;
    * ring closure preserved. Falls back to the original when the result would
    * degenerate below a valid ring (GEOS keeps rings valid). */
  def removeRepeatedPoints(closedRing: Seq[Pt], tolerance: Double): Seq[Pt] = {
    if (closedRing.size <= 2) return closedRing
    val interior = closedRing.dropRight(1) // closing pt handled at the end
    val kept = scala.collection.mutable.ArrayBuffer[Pt](interior.head)
    var i = 1
    while (i < interior.size) {
      val p = interior(i)
      val last = kept.last
      val dx = (p.x - last.x).toDouble
      val dy = (p.y - last.y).toDouble
      if (math.sqrt(dx * dx + dy * dy) > tolerance) kept += p
      i += 1
    }
    if (kept.size < 3) closedRing
    else kept.toSeq :+ kept.head
  }

  /** Largest polygon of a geometry (max area piece of a MultiPolygon, identity
    * for a Polygon), None otherwise. */
  def largestPolygon(g: Geometry): Option[Polygon] = g match {
    case p: Polygon => Some(p)
    case mp: MultiPolygon =>
      (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
        .sortBy(-_.getArea).headOption
    case _ => None
  }

  /** fit_first_into_second_linearring (basic_elements.py:255-281): clip the
    * first ring's polygon by the second's; largest piece if multi; original on
    * any topology trouble. The shapely guard `snd.intersects(fst) or not
    * fst.within(snd)` is effectively always true for distinct rings (ring
    * within ring means ON it), so the clip always runs. */
  def fitFirstIntoSecond(fst: Seq[Pt], snd: Seq[Pt]): Seq[Pt] = {
    try {
      val fstPoly = polygon(fst)
      val sndPoly = polygon(snd)
      if (!fstPoly.isValid || !sndPoly.isValid) return fst
      val inter = sndPoly.intersection(fstPoly)
      if (inter.isEmpty) return fst
      largestPolygon(inter) match {
        case Some(p) => toPts(p.getExteriorRing.getCoordinates)
        case None    => fst
      }
    } catch {
      case _: Exception => fst // reference prints "Could not find intersection!" and keeps fst
    }
  }

  /** Convex hull exterior points (basic_elements.py:307-313). Throws (like the
    * reference's AttributeError on a degenerate hull) when the hull is not a
    * polygon — callers catch per line. */
  def convexHullExterior(pts: Seq[Pt]): Seq[Pt] = {
    val hull = polygon(pts).convexHull()
    hull match {
      case p: Polygon => toPts(p.getExteriorRing.getCoordinates)
      case other => throw new IllegalStateException(s"degenerate hull: ${other.getGeometryType}")
    }
  }

  /** shapely.ops.split(polygon, line): node the boundary with the line,
    * polygonize, keep pieces whose interior point lies in the original. */
  def splitPolygon(poly: Polygon, line: LineString): Seq[Polygon] = {
    import org.locationtech.jts.operation.polygonize.Polygonizer
    val noded = poly.getBoundary.union(line)
    val pz = new Polygonizer()
    pz.add(noded)
    val it = pz.getPolygons.iterator()
    val out = Seq.newBuilder[Polygon]
    while (it.hasNext) {
      val p = it.next().asInstanceOf[Polygon]
      if (poly.contains(p.getInteriorPoint)) out += p
    }
    val res = out.result()
    if (res.isEmpty) Seq(poly) else res
  }

  /** shapely.affinity.scale(geom, xfact, yfact, origin='center'|'centroid'). */
  def scale(g: Geometry, xfact: Double, yfact: Double, useCentroid: Boolean): Geometry = {
    val (ox, oy) =
      if (useCentroid) { val c = g.getCentroid; (c.getX, c.getY) }
      else { val e = g.getEnvelopeInternal; ((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2) }
    val t = org.locationtech.jts.geom.util.AffineTransformation
      .scaleInstance(xfact, yfact, ox, oy)
    t.transform(g)
  }

  /** Exterior ring oriented counter-clockwise (shapely orient(polygon, sign=1.0)). */
  def orientCCWExterior(p: Polygon): Seq[Pt] = {
    val cs = p.getExteriorRing.getCoordinates
    val ccw = if (org.locationtech.jts.algorithm.Orientation.isCCW(cs)) cs else cs.reverse
    toPts(ccw)
  }

  /** np.median: sorted middle element / mean of the two middles
    * (models/text_elements.py:182). */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n == 0) Double.NaN
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
