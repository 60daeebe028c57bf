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
  *   - comments `<!-- … -->`, declarations `<!DOCTYPE …>`, and processing
  *     instructions (`<?xml …?>`, leaked `<?php …?>`) skipped
  *   - character entities in text and attribute values: the five named XML
  *     entities plus decimal/hex numeric refs; an unrecognized `&` stays literal
  *   - mismatched close tags recover by popping to the nearest matching open
  *     tag (ignored when none is open); close-tag attributes ignored; nesting
  *     capped at [[MaxDepth]] — tolerant of real-web tag soup
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
  /** Browsers cap DOM nesting (~512 in Blink); beyond this, open tags become
    * leaf elements so adversarial '<div><div><div>…' soup cannot build a tree
    * that overflows the stack of the recursive consumers (textOf/find/score). */
  private val MaxDepth = 512

  def parse(html: String): HElem = {
    val n = html.length
    // stack frame: (tag, attrs, children)
    var stack = List[(String, List[(String, String)], ArrayBuffer[HNode])](
      ("#root", Nil, ArrayBuffer.empty))
    var depth = 1

    def attach(node: HNode): Unit = stack.head._3 += node

    def popAttach(): Unit = {
      val (tag, attrs, kids) = stack.head
      stack = stack.tail
      depth -= 1
      stack.head._3 += HElem(tag, attrs, kids.toVector)
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' || c1 == '?') {
          // declarations, CDATA-ish noise, and processing instructions
          // ('<?xml ...?>', leaked '<?php ...?>') all skip to the next '>'
          // like a browser's bogus-comment state
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '/') {
          // close-tag name ends at whitespace (browsers ignore trailing
          // attributes on a close tag, e.g. '</div class="x">')
          var j = i + 2
          val s = j
          while (j < n && html.charAt(j) != '>' && !Character.isWhitespace(html.charAt(j))) j += 1
          val name = html.substring(s, j).toLowerCase
          while (j < n && html.charAt(j) != '>') j += 1
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
              val beforeValue = j
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
              // a nameless '=value' already advanced j past the value; only a
              // truly consumed-nothing stray char needs the anti-stall bump
              // (advancing blindly here used to swallow the closing '>')
              else if (j == beforeValue) j += 1
            }
          }
          i = j
          if (RawText(name) && !selfClose) {
            // consume raw content up to the matching close TAG — the prefix
            // must be followed by '>', '/', or whitespace so '</scripts>' or
            // a '</script' fragment inside code does not terminate early
            val e = indexOfCloseTag(html, name, i)
            attach(HElem(name, attrs.result(), Vector.empty))
            if (e < 0) i = n
            else {
              val gt = html.indexOf('>', e)
              i = if (gt < 0) n else gt + 1
            }
          } else if (Void(name) || selfClose) {
            attach(HElem(name, attrs.result(), Vector.empty))
          } else if (depth >= MaxDepth) {
            // nesting cap: treat as a leaf so pathological soup stays flat
            attach(HElem(name, attrs.result(), Vector.empty))
          } else {
            stack = (name, attrs.result(), ArrayBuffer.empty[HNode]) :: stack
            depth += 1
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

  /** Case-insensitive scan for `</name` FOLLOWED by '>', '/', or whitespace
    * (HTML's script-data end-tag rule), without copying the haystack — runs
    * per script/style element on the hot path. */
  private def indexOfCloseTag(s: String, name: String, from: Int): Int = {
    val needle = "</" + name
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var k = 0
      while (k < m && Character.toLowerCase(s.charAt(i + k)) == needle.charAt(k)) k += 1
      if (k == m) {
        if (i + m == n) return i // unterminated at EOF: treat as the close
        val next = s.charAt(i + m)
        if (next == '>' || next == '/' || Character.isWhitespace(next)) return i
      }
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
