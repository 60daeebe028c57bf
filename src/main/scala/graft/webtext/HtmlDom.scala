package graft.webtext

import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free HTML parser for the main-content extraction path
  * (north_rule: "HTML boilerplate strip, DOM heuristics"). Single forward scan,
  * no regex, no backtracking — built to run per-row inside `mapPartitions` at
  * corpus scale (same fused pattern as the PAGE-XML StAX path).
  *
  * Supported surface (all a boilerplate stripper needs):
  *   - elements, attributes (double/single/bare-quoted), self-closing tags
  *   - void elements (br, img, meta, …) never push on the stack
  *   - raw-text elements: script/style content is consumed verbatim up to the
  *     matching close tag and DROPPED (never text — a `<` or `&` inside code
  *     must not corrupt extraction)
  *   - comments `<!-- … -->` and declarations `<!DOCTYPE …>` skipped
  *   - character entities in text and attribute values: the five named XML
  *     entities plus decimal/hex numeric refs; an unrecognized `&` stays literal
  *   - mismatched close tags recover by popping to the nearest matching open
  *     tag (ignored when none is open) — tolerant of real-web tag soup
  */
object HtmlDom {

  sealed trait HNode
  final case class HText(text: String) extends HNode
  final case class HElem(tag: String, attrs: List[(String, String)], children: Vector[HNode]) extends HNode {
    def attr(name: String): Option[String] = attrs.collectFirst { case (k, v) if k == name => v }
    def classes: Set[String] = attr("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  }

  private val Void = Set("area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")
  private val RawText = Set("script", "style")

  /** Parse into a synthetic root element `#root` (its children are the
    * top-level nodes; a well-formed page contributes a single `html` child). */
  def parse(html: String): HElem = {
    val n = html.length
    // stack frame: (tag, attrs, children)
    var stack = List[(String, List[(String, String)], ArrayBuffer[HNode])](
      ("#root", Nil, ArrayBuffer.empty))

    def attach(node: HNode): Unit = stack.head._3 += node

    def popAttach(): Unit = {
      val (tag, attrs, kids) = stack.head
      stack = stack.tail
      stack.head._3 += HElem(tag, attrs, kids.toVector)
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '/') {
          var j = i + 2
          val s = j
          while (j < n && html.charAt(j) != '>') j += 1
          val name = html.substring(s, j).trim.toLowerCase
          i = if (j < n) j + 1 else n
          if (stack.exists(_._1 == name)) {
            while (stack.head._1 != name) popAttach()
            if (stack.head._1 != "#root") popAttach()
          } // else: stray close tag, ignore
        } else if (Character.isLetter(c1)) {
          // open tag: name
          var j = i + 1
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)) || html.charAt(j) == '-')) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          // attributes
          val attrs = List.newBuilder[(String, String)]
          var selfClose = false
          var done = false
          while (!done && j < n) {
            while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
            if (j < n && html.charAt(j) == '>') { j += 1; done = true }
            else if (j < n && html.charAt(j) == '/') {
              j += 1
              if (j < n && html.charAt(j) == '>') { j += 1; selfClose = true; done = true }
            } else if (j < n) {
              val as = j
              while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                     html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
              val aname = html.substring(as, j).toLowerCase
              while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
              var avalue = ""
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j); j += 1
                  val vs = j
                  while (j < n && html.charAt(j) != q) j += 1
                  avalue = decodeEntities(html.substring(vs, j))
                  if (j < n) j += 1
                } else {
                  val vs = j
                  while (j < n && !Character.isWhitespace(html.charAt(j)) && html.charAt(j) != '>') j += 1
                  avalue = decodeEntities(html.substring(vs, j))
                }
              }
              if (aname.nonEmpty) attrs += (aname -> avalue)
              else j += 1 // lone stray char; advance to avoid a stall
            }
          }
          i = j
          if (RawText(name) && !selfClose) {
            // consume raw content up to the matching close tag, drop it
            val e = indexOfIgnoreCase(html, "</" + name, i)
            attach(HElem(name, attrs.result(), Vector.empty))
            if (e < 0) i = n
            else {
              val gt = html.indexOf('>', e)
              i = if (gt < 0) n else gt + 1
            }
          } else if (Void(name) || selfClose) {
            attach(HElem(name, attrs.result(), Vector.empty))
          } else {
            stack = (name, attrs.result(), ArrayBuffer.empty[HNode]) :: stack
          }
        } else {
          // '<' not followed by tag syntax: literal text
          val e = html.indexOf('<', i + 1)
          val end = if (e < 0) n else e
          attach(HText(decodeEntities(html.substring(i, end))))
          i = end
        }
      } else {
        // search from i+1: when c is a trailing '<' (i == n-1) a search from i
        // would find i itself, emit an empty text node, and never advance
        val e = html.indexOf('<', i + 1)
        val end = if (e < 0) n else e
        attach(HText(decodeEntities(html.substring(i, end))))
        i = end
      }
    }
    while (stack.head._1 != "#root") popAttach()
    val (_, _, kids) = stack.head
    HElem("#root", Nil, kids.toVector)
  }

  /** Case-insensitive indexOf without copying the haystack (the raw-text
    * close-tag scan runs per script/style element on the hot path). */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var k = 0
      while (k < m && Character.toLowerCase(s.charAt(i + k)) == needle.charAt(k)) k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }

  /** Decode &amp; &lt; &gt; &quot; &apos; and numeric &#NN; / &#xHH; refs;
    * an '&' that doesn't start a recognized entity stays literal. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val handled =
          if (semi > i && semi - i <= 10) {
            val body = s.substring(i + 1, semi)
            body match {
              case "amp"  => sb.append('&'); true
              case "lt"   => sb.append('<'); true
              case "gt"   => sb.append('>'); true
              case "quot" => sb.append('"'); true
              case "apos" => sb.append('\''); true
              case _ if body.length > 1 && body.charAt(0) == '#' =>
                try {
                  val cp =
                    if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                      Integer.parseInt(body.substring(2), 16)
                    else Integer.parseInt(body.substring(1))
                  sb.appendCodePoint(cp); true
                } catch { case _: Exception => false }
              case _ => false
            }
          } else false
        if (handled) i = semi + 1
        else { sb.append('&'); i += 1 }
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** All descendant text concatenated (script/style were dropped at parse). */
  def textOf(node: HNode): String = {
    val sb = new java.lang.StringBuilder
    def walk(nd: HNode): Unit = nd match {
      case HText(t)         => sb.append(t)
      case HElem(_, _, kids) => kids.foreach(walk)
    }
    walk(node)
    sb.toString
  }

  /** Pre-order list of elements satisfying `p`. */
  def find(node: HNode, p: HElem => Boolean): Vector[HElem] = {
    val out = Vector.newBuilder[HElem]
    def walk(nd: HNode): Unit = nd match {
      case e @ HElem(_, _, kids) =>
        if (p(e)) out += e
        kids.foreach(walk)
      case _ =>
    }
    walk(node)
    out.result()
  }
}
