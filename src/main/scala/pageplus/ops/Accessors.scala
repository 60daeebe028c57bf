package pageplus.ops

import org.locationtech.jts.geom.Polygon

import pageplus.geo.Geo
import pageplus.model._

/** The remaining per-element accessors/predicates of SURVEY §2.2 as explicit,
  * unit-testable functions (they also back Validate/Extend internally).
  */
object Accessors {

  /** within_parent (basic_elements.py:141-150): parent polygon contains self;
    * false on ANY failure (bare except). */
  def withinParent(child: Seq[Pt], parent: Seq[Pt]): Boolean =
    try Geo.polygon(parent).contains(Geo.polygon(child))
    catch { case _: Exception => false }

  /** overlaps(polygon, ratio=0.3) (basic_elements.py:152-161):
    * intersection area > self area * ratio; false on failure. */
  def overlaps(self: Seq[Pt], other: Seq[Pt], ratio: Double = 0.3): Boolean =
    try {
      val selfPoly = Geo.polygon(self)
      Geo.polygon(other).intersection(selfPoly).getArea > selfPoly.getArea * ratio
    } catch { case _: Exception => false }

  /** contains_textline (text_elements.py:257-261). */
  def containsTextline(region: RegionT, id: String): Boolean =
    region.lines.exists(_.id == id)

  /** page_coords (models/page.py:157-176): the page rectangle
    * (0,0) (w,0) (w,h) (0,h). */
  def pageCoords(doc: PageDoc): Seq[Pt] =
    Seq(Pt(0, 0), Pt(doc.width, 0), Pt(doc.width, doc.height), Pt(0, doc.height))

  def pageCoordsString(doc: PageDoc): String = PointCodec.format(pageCoords(doc))

  def pagePolygon(doc: PageDoc): Polygon = Geo.polygon(pageCoords(doc))
}
