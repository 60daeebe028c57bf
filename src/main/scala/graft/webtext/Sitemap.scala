package graft.webtext

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sitemap ingestion — the discovery side of the crawl trio (robots admits,
  * sitemaps enumerate, the frontier schedules): parse `urlset` documents into
  * url rows with freshness hints, and resolve one level of `sitemapindex`
  * indirection (the sitemaps.org protocol caps files at 50k urls, so any
  * real host ships an index of shards).
  *
  * Parser: StAX single pass (same hardened factory settings as the PAGE-XML
  * path — DTD and external entities off, per-thread factory), localName
  * matching so namespace prefixes don't matter, unknown elements skipped.
  * `priority` is kept as BASIS POINTS parsed digit-wise from the decimal
  * string — no float ever exists on the oracle-checked path.
  *
  * Scale shape: sitemap blobs live at host/shard grain (≪ corpus). Leaf
  * parsing is a flatMap over blobs; index resolution is one equi-join of the
  * exploded child locs against the blob table (host-grain, broadcast-or-
  * shuffled by the optimizer), then the same flatMap. Output feeds the
  * frontier join at url grain.
  */
object Sitemap {

  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }
  }

  final case class SmUrl(loc: String, lastmod: String, changefreq: String, priority_bp: Long)

  /** "0.35" -> 3500, "1.0" -> 10000, digit-wise (no float). Malformed -> -1. */
  def priorityBp(s: String): Long = {
    if (s == null || s.isEmpty) return -1L
    val dot = s.indexOf('.')
    val whole = if (dot < 0) s else s.substring(0, dot)
    val frac = if (dot < 0) "" else s.substring(dot + 1)
    if (!whole.forall(_.isDigit) || !frac.forall(_.isDigit) || whole.isEmpty) return -1L
    val fracPadded = (frac + "0000").substring(0, 4)
    whole.toLong * 10000L + fracPadded.toLong
  }

  /** Parse one sitemap document. Returns (urls, childSitemapLocs): a urlset
    * yields urls; a sitemapindex yields child locs. Malformed XML degrades to
    * whatever parsed before the error (same contract as the WARC tail). */
  def parse(xml: String): (Vector[SmUrl], Vector[String]) = {
    val urls = Vector.newBuilder[SmUrl]
    val children = Vector.newBuilder[String]
    if (xml == null || xml.isEmpty) return (Vector.empty, Vector.empty)
    val r = factories.get().createXMLStreamReader(new java.io.StringReader(xml))
    try {
      var inUrl = false
      var inSitemap = false
      var field: String = null
      var loc, lastmod, changefreq, priority = ""
      def resetEntry(): Unit = { loc = ""; lastmod = ""; changefreq = ""; priority = "" }
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "url" => inUrl = true; resetEntry()
              case "sitemap" => inSitemap = true; resetEntry()
              case n @ ("loc" | "lastmod" | "changefreq" | "priority") if inUrl || inSitemap =>
                field = n
              case _ => field = null
            }
          case XMLStreamConstants.CHARACTERS if field != null =>
            val t = r.getText
            field match {
              case "loc" => loc += t
              case "lastmod" => lastmod += t
              case "changefreq" => changefreq += t
              case "priority" => priority += t
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "url" =>
                if (inUrl && loc.trim.nonEmpty)
                  urls += SmUrl(loc.trim, lastmod.trim, changefreq.trim, priorityBp(priority.trim))
                inUrl = false; field = null
              case "sitemap" =>
                if (inSitemap && loc.trim.nonEmpty) children += loc.trim
                inSitemap = false; field = null
              case "loc" | "lastmod" | "changefreq" | "priority" => field = null
              case _ =>
            }
          case _ =>
        }
      }
    } catch { case _: Exception => /* degrade: keep what parsed */ }
    finally r.close()
    (urls.result(), children.result())
  }

  // ---------------------------------------------------------------- fixture

  private def isoDate(id: Long): String =
    java.time.LocalDate.of(2020, 1, 1).plusDays(id % 365).toString

  private def freq(id: Long): String = (id % 3) match {
    case 0 => "daily"; case 1 => "weekly"; case _ => "monthly"
  }

  private def urlEntry(id: Long): String =
    s"""  <url><loc>https://site${id % 7}.example.com/articles/doc$id.html</loc>
       |    <lastmod>${isoDate(id)}</lastmod>
       |    <changefreq>${freq(id)}</changefreq>
       |    <priority>0.${id % 10}</priority></url>""".stripMargin

  private def urlset(ids: Seq[Long]): String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      ids.map(urlEntry).mkString("\n") + "\n</urlset>\n"

  /** Deterministic per-host sitemap blobs over `documents` (FIXTURES
    * family): EVEN hosts ship a `sitemapindex` of two parity shards
    * (`…/sitemap-p{0,1}.xml`, ids split by `(id/7) % 2` so both shards are
    * non-empty); odd hosts ship a single flat urlset. Keys are the sitemap
    * urls themselves. */
  def plantSitemaps(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = docs.select("doc_id").as[Long]
    ids.groupByKey(_ % 7).flatMapGroups { (h, it) =>
      val hostIds = it.toVector.sorted
      val base = s"https://site$h.example.com"
      if (h % 2 == 0) {
        val (a, b) = hostIds.partition(i => (i / 7) % 2 == 0)
        val index =
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
            s"  <sitemap><loc>$base/sitemap-p0.xml</loc></sitemap>\n" +
            s"  <sitemap><loc>$base/sitemap-p1.xml</loc></sitemap>\n" +
            "</sitemapindex>\n"
        Iterator((s"$base/sitemap.xml", index),
          (s"$base/sitemap-p0.xml", urlset(a)),
          (s"$base/sitemap-p1.xml", urlset(b)))
      } else Iterator((s"$base/sitemap.xml", urlset(hostIds)))
    }.toDF("key", "xml")
  }

  /** Blob store (fetched sitemap bytes keyed by their url) -> url rows,
    * starting from each host's `/sitemap.xml` entry point and resolving ONE
    * level of `sitemapindex` indirection: a flat entry yields its urls
    * directly; an index entry's children join back to the blob table by loc
    * and their urlsets parse in the same pass. Children that are themselves
    * indexes are NOT followed (sitemaps.org forbids nested indexes). A shard
    * missing from the blob store simply contributes nothing (unfetched). */
  def urlRows(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val parsed = blobs.select("key", "xml").as[(String, String)]
      .map { case (key, xml) =>
        val (urls, children) = parse(xml)
        (key, urls, children)
      }
      .toDF("key", "urls", "children").cache()
    val entries = parsed.filter(col("key").endsWith("/sitemap.xml"))
    val leafUrls = entries.select(explode(col("urls")).as("u"))
    val childKeys = entries.select(explode(col("children")).as("ckey")).distinct()
    val viaIndex = childKeys.join(parsed, col("ckey") === col("key"))
      .select(explode(col("urls")).as("u"))
    leafUrls.unionByName(viaIndex)
      .select(col("u.loc").as("loc"), col("u.lastmod").as("lastmod"),
        col("u.changefreq").as("changefreq"), col("u.priority_bp").as("priority_bp"))
  }
}
