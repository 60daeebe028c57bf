package pageplus.model

/** Coordinate-string codec, parity-critical (SURVEY §2.2).
  *
  * Parse: reference splits on `,|\s` and converts `int(float(v))` — truncation
  * toward zero, odd trailing value dropped by the zip (basic_elements.py:91-98).
  * Format: `f"{int(x)},{int(y)}"` space-joined, then adjacent duplicates removed
  * and a closing point equal to the first dropped (basic_elements.py:100-113,
  * 86-88, 195-202).
  */
object PointCodec {

  private val SplitPattern = java.util.regex.Pattern.compile("[,\\s]")

  /** `convert_coordinates_str_to_tuples`. Throws NumberFormatException on garbage,
    * matching the reference's ValueError (callers catch per element).
    * The pattern is precompiled — this runs once per Coords/Baseline element
    * on the hot path. */
  def parse(s: String): Seq[Pt] = {
    val parts = SplitPattern.split(s, -1)
    val vals = new Array[Int](parts.length)
    var i = 0
    while (i < parts.length) {
      vals(i) = parts(i).toDouble.toInt
      i += 1
    }
    val out = Seq.newBuilder[Pt]
    i = 0
    while (i + 1 < vals.length) {
      out += Pt(vals(i), vals(i + 1))
      i += 2
    }
    out.result()
  }

  /** `convert_coordinates_tuples_to_str`. */
  def format(pts: Seq[Pt]): String =
    pts.iterator.map(p => s"${p.x},${p.y}").mkString(" ")

  /** `_remove_adjacent_duplicates` over the "x,y" string tokens + drop closing
    * token equal to the first (basic_elements.py:195-202). Applied by
    * `update_coordinates` on every write (basic_elements.py:86). */
  def dedupUnclose(pts: Seq[Pt]): Seq[Pt] = {
    if (pts.isEmpty) return pts
    val buf = scala.collection.mutable.ArrayBuffer[Pt](pts.head)
    var i = 1
    while (i < pts.length) {
      if (pts(i) != pts(i - 1)) buf += pts(i)
      i += 1
    }
    if (buf.length > 1 && buf.head == buf.last) buf.remove(buf.length - 1)
    buf.toSeq
  }

  /** `_ensure_closed_ring` (basic_elements.py:68-70). */
  def closeRing(pts: Seq[Pt]): Seq[Pt] =
    if (pts.nonEmpty && pts.head != pts.last) pts :+ pts.head else pts
}
