package pageplus.text

import org.locationtech.jts.geom.{LineString, Polygon}

import pageplus.geo.Geo
import pageplus.model._

/** `export dsv` line-grain rows (cli/export.py:97-126).
  *
  * Literal semantics: only TEXT regions (table cells excluded); `region` is the
  * index of the textregion in document order; start/end are baseline BOUNDS
  * (minx,miny)/(maxx,maxy), not endpoints; mean is the baseline centroid;
  * area/width/length come from the coords minimum rotated rectangle (shortest /
  * longest side); -1 sentinels when baseline / coords are unusable; the
  * reference's `if line.get_text is None` compares a bound method and never
  * skips, so textless lines still emit (cli/export.py:102).
  */
object Dsv {

  final case class DsvRow(
      url: String, id: String, text: String, region: Int,
      start_x: Int, start_y: Int, mean_x: Int, mean_y: Int, end_x: Int, end_y: Int,
      area: Int, width: Int, length: Int)

  /** The reference's file layout (cli/export.py:131-144): header
    * `id,text,region,start,mean,end,area,width,length`, with start/mean/end
    * rendered as python list reprs `[x, y]`. The table-grain sink prepends
    * `url` (one partitioned dataset instead of one file per page — at table
    * grain the page identity must not vanish). */
  def csvColumns(rows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def pair(x: String, y: String) =
      concat(lit("["), col(x).cast("string"), lit(", "), col(y).cast("string"), lit("]"))
    rows.select(col("url"), col("id"), col("text"), col("region"),
      pair("start_x", "start_y").as("start"), pair("mean_x", "mean_y").as("mean"),
      pair("end_x", "end_y").as("end"), col("area"), col("width"), col("length"))
  }

  /** DSV file sink: header + configurable delimiter (the CLI's `--delimiter`,
    * default tab like the reference's TSV), minimal quoting as with python's
    * csv.writer — escape set to '"' so embedded quotes are DOUBLED, python
    * style, not backslash-escaped (Spark's default). Unix newlines
    * (divergence: the reference's csv.writer emits CRLF; Spark's CSV sink is
    * newline-based — documented, not hidden). */
  def writeCsv(rows: org.apache.spark.sql.DataFrame, path: String,
               delimiter: String = "\t"): Unit =
    csvColumns(rows).write.mode("overwrite")
      .option("header", "true").option("delimiter", delimiter)
      .option("escape", "\"")
      .csv(path)

  /** Read a [[writeCsv]] dataset back into the csv-column shape. */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              delimiter: String = "\t"): org.apache.spark.sql.DataFrame =
    spark.read.option("header", "true").option("delimiter", delimiter)
      .option("inferSchema", "false").option("escape", "\"")
      .csv(path)

  /** DSV with the dehyphenate flag (cli/export.py:128-129): dehyphe is applied
    * to the TEXT COLUMN ONLY, and because it drops exact-empty entries the
    * column can get SHORTER than the others — the reference then writes
    * `zip(*line_infos.values())`, which silently truncates every column to the
    * shortest and mis-aligns texts after a dropped empty line. Reproduced
    * literally (SURVEY §2.8 "length-mismatch hazard"). */
  def rowsDehyphenated(doc: PageDoc): Seq[DsvRow] = {
    val base = rows(doc)
    val newTexts = Dehyphe(base.map(_.text))
    base.zip(newTexts).map { case (r, t) => r.copy(text = t) } // zip = truncate to shortest
  }

  def rows(doc: PageDoc): Seq[DsvRow] =
    doc.textRegions.zipWithIndex.flatMap { case (r, rid) =>
      r.lines.map { line =>
        val (sx, sy, mx, my, ex, ey) =
          if (line.hasBaseline && line.baseline.size >= 2) {
            try {
              val bl: LineString = Geo.lineString(line.baseline)
              val env = bl.getEnvelopeInternal
              val c = bl.getCentroid
              (env.getMinX.toInt, env.getMinY.toInt, c.getX.toInt, c.getY.toInt,
                env.getMaxX.toInt, env.getMaxY.toInt)
            } catch { case _: Exception => (-1, -1, -1, -1, -1, -1) }
          } else (-1, -1, -1, -1, -1, -1)
        val (area, width, len) =
          if (line.hasCoords && line.coords.size >= 3) {
            // contained: a 3-point CLOSED ring passes the size guard but still
            // fails LinearRing construction — sentinel, never a task failure
            try {
              Geo.mrr(Geo.polygon(line.coords)) match {
                case p: Polygon =>
                  val sides = Geo.sideLengths(p)
                  (p.getArea.toInt, sides.head.toInt, sides.last.toInt)
                case _ => (-1, -1, -1) // degenerate mrr: reference would crash; engine contains
              }
            } catch { case _: Exception => (-1, -1, -1) }
          } else (-1, -1, -1)
        DsvRow(doc.url, line.id, Option(line.getText).getOrElse(""), rid,
          sx, sy, mx, my, ex, ey, area, width, len)
      }
    }
}
