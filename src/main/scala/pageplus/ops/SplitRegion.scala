package pageplus.ops

import org.locationtech.jts.geom.{MultiLineString, Polygon}

import pageplus.geo.Geo
import pageplus.model._

/** `split_region_by_textlinecoords` (models/text_elements.py:209-255): split a
  * region into two column groups around the mean of the outer tercile means of
  * line-centroid x values. Reference quirks preserved: np.array_split chunking;
  * `int()` truncations; the buffer whose result is discarded (a literal no-op,
  * models/text_elements.py:232); `regions[x < mean]` bool indexing (index 0 =
  * right/ >= mean side, index 1 = left); subtract the smaller-mrr group's
  * polygon from the bigger one.
  */
object SplitRegion {

  final case class SideGroup(lines: Seq[LineT], ring: Seq[Pt])

  /** np.array_split(sorted(xs), parts): first (n % parts) chunks get an extra
    * element. */
  def arraySplit(xs: Seq[Int], parts: Int): Seq[Seq[Int]] = {
    val n = xs.size
    val k = n / parts
    val m = n % parts
    val out = Seq.newBuilder[Seq[Int]]
    var idx = 0
    for (p <- 0 until parts) {
      val size = if (p < m) k + 1 else k
      out += xs.slice(idx, idx + size)
      idx += size
    }
    out.result()
  }

  /** Returns the two side groups (index 0 = right of the mean, 1 = left), or
    * Nil when the reference would return [] (too few lines / means too close). */
  def split(region: RegionT,
            centerModeParts: Int = 3,
            centerModeIdx: (Int, Int) = (0, 2),
            minMeanGrpDistance: Int = 500,
            subtractSmallFromBig: Boolean = true): Seq[SideGroup] = {
    val usable = region.lines.filter(l => l.hasCoords && l.coords.size >= 3)
    if (usable.size != region.lines.size) return Nil // reference would crash on None polygon
    // a 3-point closed ring passes the size guard but fails LinearRing
    // construction — the reference would crash there too; contained to Nil
    val centers =
      try region.lines.map(l => Geo.polygon(l.coords).getCentroid.getX.toInt)
      catch { case _: Exception => return Nil }
    if (centers.size < centerModeParts) return Nil

    val grps = arraySplit(centers.sorted, centerModeParts)
    val means = Seq(centerModeIdx._1, centerModeIdx._2).map { i =>
      val g = grps(i)
      if (g.isEmpty) 0.0 else g.sum.toDouble / g.size
    }
    if (means.size > 1 && means(1) - means(0) < minMeanGrpDistance) return Nil
    val xMean = (means.sum / means.size).toInt

    // regions[x_center < x_mean]: False -> 0 (right side), True -> 1 (left)
    val sides = Array(Seq.newBuilder[LineT], Seq.newBuilder[LineT])
    val coords = Array(Seq.newBuilder[Pt], Seq.newBuilder[Pt])
    region.lines.zip(centers).foreach { case (l, c) =>
      val idx = if (c < xMean) 1 else 0
      sides(idx) += l
      coords(idx) ++= PointCodec.closeRing(l.coords) // exterior ring coords incl closing pt
    }
    val rings = (0 to 1).map { i =>
      val hull = Geo.polygon(coords(i).result()).convexHull()
      hull match {
        case p: Polygon =>
          // reference: region_polygon.buffer(12, ...) result DISCARDED (literal no-op)
          Geo.orientCCWExterior(p)
        case _ => return Nil // degenerate hull: reference would raise
      }
    }
    var groups = (0 to 1).map(i => SideGroup(sides(i).result(), rings(i)))

    if (subtractSmallFromBig && groups.size == 2) {
      val areas = groups.map(g => Geo.mrr(Geo.polygon(g.ring)).getArea)
      val (big, small) = if (areas(0) < areas(1)) (1, 0) else (0, 1)
      val diff = Geo.polygon(groups(big).ring).difference(Geo.polygon(groups(small).ring))
      val newRing = diff match {
        case p: Polygon          => Geo.toPts(p.getExteriorRing.getCoordinates)
        case m: MultiLineString  => Geo.toPts(m.convexHull().asInstanceOf[Polygon].getExteriorRing.getCoordinates)
        case _                   => groups(big).ring // MultiPolygon etc.: reference leaves the ring
      }
      groups = groups.updated(big, groups(big).copy(ring = newRing))
    }
    groups
  }
}
