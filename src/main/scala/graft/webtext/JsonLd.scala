package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset}

/** JSON-LD structured-metadata mining — the schema.org layer news/article
  * pages publish (`<script type="application/ld+json">`), and the highest-
  * precision source of headline/date/author a curation pipeline gets (far
  * cleaner than DOM heuristics when present).
  *
  * [[HtmlDom]] deliberately DROPS script bodies at parse (they are code, not
  * text), so the ld+json payloads are recovered by a dedicated raw scan that
  * reuses the parser's script-data end-tag rule, then fed through a minimal
  * recursive-descent JSON parser (numbers kept as RAW strings — integer
  * exactness end-to-end, no doubles on an oracle-checked path). Malformed
  * JSON yields no row for that block, never an exception.
  *
  * Scale shape: map-side per-row scan+parse inside `mapPartitions`, zero
  * shuffles; the scan touches only script spans, the JSON is tiny relative
  * to page bytes. */
object JsonLd {

  // ------------------------------------------------------------- JSON model
  sealed trait J
  final case class JStr(s: String) extends J
  /** Raw numeric token (never converted to double). */
  final case class JNum(raw: String) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J
  final case class JArr(items: Vector[J]) extends J
  final case class JObj(fields: Vector[(String, J)]) extends J {
    def get(k: String): Option[J] = fields.collectFirst { case (`k`, v) => v }
  }

  // ------------------------------------------------------------ JSON parser
  /** Strict-enough recursive-descent parse of one JSON document; None on any
    * syntax error (a malformed publisher block must not kill the page). */
  def parse(s: String): Option[J] = {
    if (s == null) return None
    val n = s.length
    var i = 0
    def ws(): Unit = { while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1 }
    def fail(): Nothing = throw new IllegalArgumentException("bad json at " + i)
    def expect(c: Char): Unit = { if (i >= n || s.charAt(i) != c) fail(); i += 1 }
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else fail()
    def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) fail()
          s.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' =>
              if (i + 5 >= n) fail()
              val cp = (hex(s.charAt(i + 2)) << 12) | (hex(s.charAt(i + 3)) << 8) |
                (hex(s.charAt(i + 4)) << 4) | hex(s.charAt(i + 5))
              sb.append(cp.toChar); i += 6
            case _ => fail()
          }
        } else { sb.append(c); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def num(): J = {
      val st = i
      if (i < n && s.charAt(i) == '-') i += 1
      while (i < n && s.charAt(i).isDigit) i += 1
      if (i < n && s.charAt(i) == '.') { i += 1; while (i < n && s.charAt(i).isDigit) i += 1 }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (i < n && s.charAt(i).isDigit) i += 1
      }
      if (i == st || (i == st + 1 && s.charAt(st) == '-')) fail()
      JNum(s.substring(st, i))
    }
    def value(): J = {
      ws()
      if (i >= n) fail()
      s.charAt(i) match {
        case '"' => JStr(str())
        case '{' =>
          i += 1; ws()
          val fs = Vector.newBuilder[(String, J)]
          if (i < n && s.charAt(i) == '}') { i += 1; return JObj(fs.result()) }
          var more = true
          while (more) {
            ws(); val k = str(); ws(); expect(':'); val v = value()
            fs += ((k, v)); ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else { expect('}'); more = false }
          }
          JObj(fs.result())
        case '[' =>
          i += 1; ws()
          val xs = Vector.newBuilder[J]
          if (i < n && s.charAt(i) == ']') { i += 1; return JArr(xs.result()) }
          var more = true
          while (more) {
            xs += value(); ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else { expect(']'); more = false }
          }
          JArr(xs.result())
        case 't' => if (s.startsWith("true", i)) { i += 4; JBool(true) } else fail()
        case 'f' => if (s.startsWith("false", i)) { i += 5; JBool(false) } else fail()
        case 'n' => if (s.startsWith("null", i)) { i += 4; JNull } else fail()
        case _ => num()
      }
    }
    try {
      val v = value(); ws()
      if (i != n) None else Some(v)
    } catch { case _: Exception => None }
  }

  // --------------------------------------------------------- raw html scan
  /** Raw payloads of every `<script type="application/ld+json">` block, in
    * document order. Tolerant of attribute order/quoting; uses the same
    * end-tag rule as the DOM parser (a `</script` fragment inside a string
    * does not terminate early only if followed by non-tag chars — the spec's
    * script-data rule; publishers escape it as `<\/script` anyway). */
  def extractBlocks(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while ({ i = lower.indexOf("<script", i); i >= 0 }) {
      val gt = lower.indexOf('>', i)
      if (gt < 0) return out.result()
      val tag = lower.substring(i, gt)
      var e = lower.indexOf("</script", gt + 1)
      if (e < 0) e = html.length
      if (tag.contains("application/ld+json")) out += html.substring(gt + 1, e)
      i = if (e >= html.length) html.length else e + 1
      if (i >= html.length) return out.result()
    }
    out.result()
  }

  // ------------------------------------------------------------ extraction
  final case class ArticleMeta(doc_id: Long, headline: String, date_published: String,
                               author_name: String, word_count: Long)

  /** First block whose object carries `"@type":"Article"` wins; author may be
    * a bare string or a Person object (both shapes occur in the wild); a
    * missing/malformed field degrades to ""/-1, never null/exception. */
  def articleOf(docId: Long, html: String): Option[ArticleMeta] = {
    extractBlocks(html).iterator.flatMap(parse).collectFirst {
      case o: JObj if o.get("@type").contains(JStr("Article")) =>
        val headline = o.get("headline").collect { case JStr(s) => s }.getOrElse("")
        val date = o.get("datePublished").collect { case JStr(s) => s }.getOrElse("")
        val author = o.get("author") match {
          case Some(JStr(s)) => s
          case Some(ao: JObj) => ao.get("name").collect { case JStr(s) => s }.getOrElse("")
          case _ => ""
        }
        val wc = o.get("wordCount").collect { case JNum(raw) =>
          try raw.toLong catch { case _: Exception => -1L }
        }.getOrElse(-1L)
        ArticleMeta(docId, headline, date, author, wc)
    }
  }

  /** documents -> per-doc Article metadata over the deterministic
    * [[HtmlGen.pageWithJsonLd]] payload (pages without an Article block —
    * doc_id%11==3 plants none — are ABSENT, the honest corpus shape). */
  def articles(docs: DataFrame): Dataset[ArticleMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        articleOf(id, HtmlGen.pageWithJsonLd(id, if (text == null) "" else text))
      })
  }
}
