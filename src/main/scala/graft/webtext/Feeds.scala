package graft.webtext

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the syndication-discovery leg of a crawl
  * frontier (feeds announce fresh urls cheaper than recrawling every page;
  * item timestamps feed the [[Recrawl.recrawlIntervals]] estimator).
  *
  * One StAX pass per blob handles BOTH formats (root element dispatches:
  * `<rss>`/`<channel>`/`<item>` vs `<feed>`/`<entry>`; Atom carries the link
  * in `<link href=…/>`, RSS in element text). Malformed XML degrades to the
  * items parsed before the error — the sitemap/WARC tail contract. Dates stay
  * STRINGS end-to-end (never cast to timestamp on an oracle-checked path —
  * CLAUDE.md NTZ rule); downstream epoch math goes through TimeCols.
  *
  * Scale shape: map-side flatMap at feed-blob grain, item rows ≪ feed bytes,
  * zero shuffles; the fixture is one feed per document so the driver check
  * covers both formats and the entity trap at every sf. */
object Feeds {

  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }
  }

  /** (fmt, items) where fmt ∈ {"rss","atom",""} and each item is
    * (title, link, stamp) — stamp = pubDate text (RSS) / updated text (Atom). */
  def parse(xml: String): (String, Vector[(String, String, String)]) = {
    if (xml == null || xml.isEmpty) return ("", Vector.empty)
    val items = Vector.newBuilder[(String, String, String)]
    var fmt = ""
    val r = factories.get().createXMLStreamReader(new java.io.StringReader(xml))
    try {
      var inItem = false
      var field: String = null
      var title, link, stamp = ""
      def resetEntry(): Unit = { title = ""; link = ""; stamp = "" }
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "rss" if fmt.isEmpty => fmt = "rss"
              case "feed" if fmt.isEmpty => fmt = "atom"
              case "item" if fmt == "rss" => inItem = true; resetEntry()
              case "entry" if fmt == "atom" => inItem = true; resetEntry()
              case "title" if inItem => field = "title"
              case "link" if inItem =>
                if (fmt == "atom") {
                  val href = r.getAttributeValue(null, "href")
                  if (href != null) link += href
                  field = null
                } else field = "link"
              case "pubDate" if inItem && fmt == "rss" => field = "stamp"
              case "updated" if inItem && fmt == "atom" => field = "stamp"
              case _ => field = null
            }
          case XMLStreamConstants.CHARACTERS if inItem && field != null =>
            val t = r.getText
            field match {
              case "title" => title += t
              case "link" => link += t
              case "stamp" => stamp += t
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "item" | "entry" =>
                if (inItem) items += ((title.trim, link.trim, stamp.trim))
                inItem = false; field = null
              case "title" | "link" | "pubDate" | "updated" => field = null
              case _ =>
            }
          case _ =>
        }
      }
    } catch { case _: Exception => /* degrade: keep what parsed */ }
    finally r.close()
    (fmt, items.result())
  }

  // ---------------------------------------------------------------- fixture

  private def isoDate(n: Long): String =
    java.time.LocalDate.of(2020, 1, 1).plusDays(n % 365).toString

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One deterministic feed per document: even doc_ids publish RSS 2.0, odd
    * publish Atom; 1 + doc_id%4 items; item i's title carries an entity trap
    * (` & news` written as `&amp; news`) when (doc_id+i)%5==0; stamps are the
    * sitemap-family ISO date (pure arithmetic, RSS keeps the bare date too —
    * real feeds mix date shapes and the parser must not interpret them). */
  def plantFeeds(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id").as[Long].map { id =>
      val host = s"https://site${id % 7}.example.com"
      val n = (1 + id % 4).toInt
      val items = (0 until n).map { i =>
        val title = xmlEscape(s"item $id $i" + (if ((id + i) % 5 == 0) " & news" else ""))
        val link = s"$host/a/$id/$i"
        val stamp = isoDate(id + i)
        if (id % 2 == 0)
          s"  <item><title>$title</title><link>$link</link><pubDate>$stamp</pubDate></item>"
        else
          s"""  <entry><title>$title</title><link href="$link"/><updated>$stamp</updated></entry>"""
      }.mkString("\n")
      val xml =
        if (id % 2 == 0)
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<rss version=\"2.0\"><channel>\n" +
            s"<title>site${id % 7} wire</title>\n$items\n</channel></rss>\n"
        else
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<feed xmlns=\"http://www.w3.org/2005/Atom\">\n" +
            s"<title>site${id % 7} wire</title>\n$items\n</feed>\n"
      (id, xml)
    }.toDF("doc_id", "xml")
  }

  final case class FeedItem(doc_id: Long, fmt: String, item_idx: Long,
                            title: String, link: String, stamp: String)

  /** feed blobs (doc_id, xml) -> one row per item. Note the channel/feed
    * `<title>` sits OUTSIDE any item and must not leak into item titles. */
  def items(blobs: DataFrame): Dataset[FeedItem] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "xml").as[(Long, String)].flatMap { case (id, xml) =>
      val (fmt, its) = parse(xml)
      its.zipWithIndex.map { case ((t, l, st), i) =>
        FeedItem(id, fmt, i.toLong, t, l, st)
      }
    }
  }
}
