package graft.layout

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}

/** Real PDF text extraction over uncompressed PDF 1.4 binaries
  * (north_rule: "PDF/layout parse").
  *
  * [[LayoutText]] covers the layout-analysis half over a span table; this
  * module makes the *decoder* half real. No external codec library is
  * needed: uncompressed streams are plain bytes and /FlateDecode (the filter
  * virtually every real PDF uses) is the JDK's java.util.zip DEFLATE. The
  * renderer emits byte-exact PDF 1.4 (catalog / pages tree /
  * font / per-page content streams, an xref table whose 20-byte entries carry
  * the true byte offset of every object, and a startxref trailer), and the
  * parser is a genuine structural reader — it locates the xref from the file
  * tail, resolves objects ONLY through xref offsets (never by scanning),
  * walks /Root -> /Pages -> /Kids -> /Contents, and tokenizes each content
  * stream (string-literal escapes, kerned TJ arrays, Tm/Td text-matrix
  * tracking) into positioned spans. Reading order is then rebuilt by the same
  * x-gap column clustering as LayoutText, with y descending (PDF user space
  * grows upward).
  *
  * The PDF bytes are synthesized deterministically from the documents table
  * (the multimodal stand-in pattern: no real PDFs exist in the sandbox), with
  * deliberate parser hazards: per-page span emission order is hash-scrambled
  * (real PDFs show text in arbitrary stream order), positioning alternates
  * absolute Tm / relative Td, and odd-indexed multi-word spans are shown as
  * kerned TJ arrays whose inter-chunk space exists only as a -250 kern.
  *
  * Scale shape: render -> parse -> layout is wholly map-side (one task per
  * input split, spans never cross a shuffle); at 10^12 documents the job is
  * embarrassingly parallel and bounded by the largest single document.
  */
object Pdf {
  import LayoutText.{Span, Extracted, WordsPerSpan, LinesPerPage, Col0X, Col1X}

  private val Iso = StandardCharsets.ISO_8859_1

  /** Kern magnitude (thousandths of an em, text space) at or beyond which a
    * TJ adjustment reads as an inter-word space. */
  val KernSpace = 200

  // ---- rendering ------------------------------------------------------------

  /** PDF string-literal escaping (ISO 32000-1 7.3.4.2). */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private final case class Placed(page: Int, x: Int, y: Int, text: String, idx: Int)

  /** Two-column layout in PDF page space: global line `i` lands on page
    * `i / LinesPerPage`; within a page the first ceil(m/2) lines fill the
    * left column, the rest the right; row r renders at y = 720 - 24*r
    * (descending down the page, as PDF y grows upward). */
  private def place(text: String): Vector[Placed] = {
    val lines = (if (text == null) "" else text)
      .split(" ", -1).grouped(WordsPerSpan).map(_.mkString(" ")).toVector
    val n = lines.size
    lines.zipWithIndex.map { case (t, i) =>
      val page = i / LinesPerPage
      val m = math.min(LinesPerPage, n - page * LinesPerPage)
      val k = i % LinesPerPage
      val half = (m + 1) / 2
      val (x, row) = if (k < half) (Col0X, k) else (Col1X, k - half)
      Placed(page, x, 720 - 24 * row, t, i)
    }
  }

  /** One page's content stream: hash-scrambled emission order; absolute Tm
    * for even global line indices (and always for the first op of a stream,
    * since Td is relative to stream-local state), relative Td otherwise;
    * kerned TJ for odd-indexed spans with an internal space, plain Tj else. */
  private def contentStream(url: String, page: Vector[Placed]): String = {
    val emit = page.sortBy(p => graft.textops.TextHash.fnv64(s"$url/${p.page}/${p.x},${p.y}"))
    val sb = new StringBuilder
    sb.append("BT\n/F1 10 Tf\n")
    var cx = 0; var cy = 0; var first = true
    emit.foreach { p =>
      if (p.idx % 2 == 0 || first) sb.append(s"1 0 0 1 ${p.x} ${p.y} Tm\n")
      else sb.append(s"${p.x - cx} ${p.y - cy} Td\n")
      cx = p.x; cy = p.y; first = false
      val sp = p.text.indexOf(' ')
      if (p.idx % 2 == 1 && sp >= 0)
        sb.append(s"[(${escape(p.text.substring(0, sp))}) -250 (${escape(p.text.substring(sp + 1))})] TJ\n")
      else
        sb.append(s"(${escape(p.text)}) Tj\n")
    }
    sb.append("ET")
    sb.toString
  }

  /** zlib-wrap `data` (RFC 1950/1951 via java.util.zip, the JDK's DEFLATE —
    * no external codec). Fixed level so a given input always compresses to
    * the same bytes within a run; correctness never depends on the
    * compressed image, only on round-tripping through [[inflate]]. */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Inverse of [[deflate]]; throws on corrupt or truncated streams. */
  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(false)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || !inf.needsInput(), "truncated FlateDecode stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Deterministic PDF 1.4 bytes for one document. Objects: 1 catalog,
    * 2 pages tree, 3 font, then (page, contents) pairs; xref entries are
    * exactly 20 bytes and carry true offsets. With `compress` the content
    * streams are /Filter /FlateDecode (the form virtually every real PDF
    * takes); the structural layout, object numbering, and xref discipline
    * are identical — only stream bytes and offsets change. */
  def render(docId: Long, text: String, compress: Boolean = false): Array[Byte] = {
    val url = s"doc://$docId"
    val placed = place(text)
    val nPages = placed.map(_.page).max + 1
    val byPage = (0 until nPages).toVector.map(p => placed.filter(_.page == p))
    val objs = Vector.newBuilder[String]
    val kids = (0 until nPages).map(p => s"${4 + 2 * p} 0 R").mkString(" ")
    objs += "<< /Type /Catalog /Pages 2 0 R >>"
    objs += s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>"
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    byPage.zipWithIndex.foreach { case (pg, p) =>
      objs += ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * p} 0 R >>")
      val st = contentStream(url, pg)
      if (compress) {
        val z = deflate(st.getBytes(Iso))
        objs += (s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n" +
          new String(z, Iso) + "\nendstream")
      } else
        objs += s"<< /Length ${st.length} >>\nstream\n$st\nendstream"
    }
    val bodies = objs.result()
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val offsets = new Array[Int](bodies.size + 1)
    bodies.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = sb.length
      sb.append(i + 1).append(" 0 obj\n").append(body).append("\nendobj\n")
    }
    val xrefOff = sb.length
    sb.append("xref\n0 ").append(bodies.size + 1).append('\n')
    sb.append("0000000000 65535 f \n")
    (1 to bodies.size).foreach(i => sb.append(f"${offsets(i)}%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${bodies.size + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(Iso)
  }

  // ---- object model + lexer ---------------------------------------------------

  sealed trait PVal
  final case class PNum(v: Double) extends PVal
  final case class PName(v: String) extends PVal
  final case class PStr(v: String) extends PVal
  final case class PArr(v: Vector[PVal]) extends PVal
  final case class PDict(v: Map[String, PVal]) extends PVal
  final case class PRef(num: Int) extends PVal

  /** Pull lexer over raw bytes. `allowRefs` enables the `N G R` indirect-
    * reference lookahead (object/trailer context); content streams parse with
    * it off, so operand numbers never backtrack. */
  final class Lexer(val bytes: Array[Byte], var pos: Int, allowRefs: Boolean) {
    private def at(i: Int): Char = (bytes(i) & 0xff).toChar
    def eof: Boolean = pos >= bytes.length
    def skipWs(): Unit = {
      while (!eof && (at(pos) match {
        case ' ' | '\t' | '\r' | '\n' | '\f' | '\u0000' => true
        case '%' => while (!eof && at(pos) != '\n') pos += 1; true
        case _ => false
      })) pos += 1
    }
    private def isDelim(c: Char) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    private def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == '\u0000'
    /** Bare token: operator keyword or obj/endobj/stream markers. */
    def token(): String = {
      skipWs()
      val start = pos
      while (!eof && !isWs(at(pos)) && !isDelim(at(pos))) pos += 1
      new String(bytes, start, pos - start, Iso)
    }
    def peek(): Char = { skipWs(); if (eof) '\u0000' else at(pos) }
    /** Consume the end-of-line after the `stream` keyword (CRLF or LF). */
    def streamEol(): Unit = {
      if (!eof && at(pos) == '\r') pos += 1
      if (!eof && at(pos) == '\n') pos += 1
    }
    def name(): String = {
      require(at(pos) == '/', s"name expected at $pos")
      pos += 1
      val start = pos
      while (!eof && !isWs(at(pos)) && !isDelim(at(pos))) pos += 1
      new String(bytes, start, pos - start, Iso)
    }
    def stringLit(): String = {
      require(at(pos) == '(', s"string expected at $pos")
      pos += 1
      val sb = new StringBuilder
      var depth = 1
      while (depth > 0) {
        val c = at(pos); pos += 1
        c match {
          case '\\' =>
            val e = at(pos); pos += 1
            e match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case '(' => sb.append('(')
              case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && at(pos) >= '0' && at(pos) <= '7') { v = v * 8 + (at(pos) - '0'); pos += 1; k += 1 }
                sb.append(v.toChar)
              case '\n' => () // line continuation
              case other => sb.append(other)
            }
          case '(' => depth += 1; sb.append('(')
          case ')' => depth -= 1; if (depth > 0) sb.append(')')
          case other => sb.append(other)
        }
      }
      sb.toString
    }
    def number(): Double = {
      val start = pos
      if (at(pos) == '+' || at(pos) == '-') pos += 1
      while (!eof && ((at(pos) >= '0' && at(pos) <= '9') || at(pos) == '.')) pos += 1
      new String(bytes, start, pos - start, Iso).toDouble
    }
    def value(): PVal = {
      skipWs()
      at(pos) match {
        case '<' if at(pos + 1) == '<' =>
          pos += 2
          val m = Map.newBuilder[String, PVal]
          var done = false
          while (!done) {
            skipWs()
            if (at(pos) == '>' && at(pos + 1) == '>') { pos += 2; done = true }
            else { val k = name(); m += (k -> value()) }
          }
          PDict(m.result())
        case '[' =>
          pos += 1
          val b = Vector.newBuilder[PVal]
          while (peek() != ']') b += value()
          pos += 1
          PArr(b.result())
        case '/' => PName(name())
        case '(' => PStr(stringLit())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val n = number()
          if (allowRefs && n >= 0 && n == math.floor(n)) {
            val save2 = pos
            skipWs()
            val c2 = if (eof) '\u0000' else at(pos)
            if (c2 >= '0' && c2 <= '9') {
              number()
              skipWs()
              if (!eof && at(pos) == 'R' &&
                  (pos + 1 >= bytes.length || isWs(at(pos + 1)) || isDelim(at(pos + 1)))) {
                pos += 1
                return PRef(n.toInt)
              }
            }
            pos = save2
          }
          PNum(n)
        case other => throw new IllegalArgumentException(s"unexpected '$other' at $pos")
      }
    }
  }

  // ---- structural parse ---------------------------------------------------------

  final case class PdfDoc(spans: Vector[Span], nPages: Int, nObjects: Int,
                          xrefSize: Int, nTj: Long, nTtj: Long)

  private def asDict(v: PVal): Map[String, PVal] = v.asInstanceOf[PDict].v
  private def asRef(v: PVal): Int = v.asInstanceOf[PRef].num

  /** Parse one indirect object at a byte offset; returns its value and, for
    * stream objects, the exact /Length bytes of stream data. */
  private def objectAt(lx: Lexer, off: Int): (PVal, Option[Array[Byte]]) = {
    lx.pos = off
    val numTok = lx.token(); val genTok = lx.token(); val kw = lx.token()
    require(numTok.nonEmpty && genTok.nonEmpty && kw == "obj", s"malformed object at $off")
    val v = lx.value()
    lx.skipWs()
    val save = lx.pos
    val next = lx.token()
    if (next == "stream") {
      lx.streamEol()
      val len = asDict(v)("Length").asInstanceOf[PNum].v.toInt
      val data = java.util.Arrays.copyOfRange(lx.bytes, lx.pos, lx.pos + len)
      lx.pos += len
      require(lx.token() == "endstream", s"endstream expected after $off")
      (v, Some(data))
    } else { lx.pos = save; (v, None) }
  }

  /** Tokenize one content stream into positioned spans + show-op counts. */
  private def contentSpans(url: String, pageNo: Int, data: Array[Byte]): (Vector[Span], Long, Long) = {
    val lx = new Lexer(data, 0, allowRefs = false)
    val stack = scala.collection.mutable.ArrayBuffer.empty[PVal]
    val out = Vector.newBuilder[Span]
    var lxp = 0.0; var lyp = 0.0
    var nTj = 0L; var nTtj = 0L
    def popN(n: Int): Seq[PVal] = { val s = stack.takeRight(n).toSeq; stack.remove(stack.length - n, n); s }
    lx.skipWs()
    while (!lx.eof) {
      val c = lx.peek()
      if (c == '(' || c == '[' || c == '/' || c == '<' || c == '+' || c == '-' || c == '.' ||
          (c >= '0' && c <= '9')) stack += lx.value()
      else lx.token() match {
        case "BT" => lxp = 0; lyp = 0
        case "ET" => ()
        case "Tf" => popN(2)
        case "Tm" =>
          val ops = popN(6)
          lxp = ops(4).asInstanceOf[PNum].v; lyp = ops(5).asInstanceOf[PNum].v
        case "Td" | "TD" =>
          val ops = popN(2)
          lxp += ops(0).asInstanceOf[PNum].v; lyp += ops(1).asInstanceOf[PNum].v
        case "Tj" =>
          val s = popN(1).head.asInstanceOf[PStr].v
          nTj += 1
          out += Span(url, pageNo, lxp.toInt, lyp.toInt, s)
        case "TJ" =>
          val arr = popN(1).head.asInstanceOf[PArr].v
          nTtj += 1
          val sb = new StringBuilder
          arr.foreach {
            case PStr(s) => sb.append(s)
            case PNum(k) => if (k <= -KernSpace) sb.append(' ')
            case other => throw new IllegalArgumentException(s"bad TJ element $other")
          }
          out += Span(url, pageNo, lxp.toInt, lyp.toInt, sb.toString)
        case "" => () // trailing ws
        case _ => stack.clear() // unknown operator: drop its operands
      }
      lx.skipWs()
    }
    (out.result(), nTj, nTtj)
  }

  /** Full structural parse: startxref -> xref offsets -> trailer /Root ->
    * catalog -> pages tree -> per-page content streams -> spans. Objects are
    * reached ONLY via xref byte offsets. */
  def parse(url: String, bytes: Array[Byte]): PdfDoc = {
    val tailLen = math.min(128, bytes.length)
    val tail = new String(bytes, bytes.length - tailLen, tailLen, Iso)
    val sx = tail.lastIndexOf("startxref")
    require(sx >= 0, "startxref not found")
    val xrefOff = tail.substring(sx + 9).trim.takeWhile(_.isDigit).toInt

    val lx = new Lexer(bytes, xrefOff, allowRefs = true)
    require(lx.token() == "xref", "xref table expected")
    val first = lx.token().toInt
    val count = lx.token().toInt
    val offsets = new Array[Int](first + count)
    var i = 0
    while (i < count) {
      val off = lx.token().toInt
      lx.token() // generation
      val kind = lx.token()
      if (kind == "n") offsets(first + i) = off
      i += 1
    }
    require(lx.token() == "trailer", "trailer expected")
    val trailer = asDict(lx.value())
    val size = trailer("Size").asInstanceOf[PNum].v.toInt

    def load(num: Int): (PVal, Option[Array[Byte]]) = objectAt(lx, offsets(num))
    val catalog = asDict(load(asRef(trailer("Root")))._1)
    val pages = asDict(load(asRef(catalog("Pages")))._1)
    val kids = pages("Kids").asInstanceOf[PArr].v.map(asRef)
    var nTj = 0L; var nTtj = 0L
    val spans = Vector.newBuilder[Span]
    kids.zipWithIndex.foreach { case (kid, pageNo) =>
      val page = asDict(load(kid)._1)
      val (cv, rawOpt) = load(asRef(page("Contents")))
      val raw = rawOpt
        .getOrElse(throw new IllegalArgumentException(s"page $pageNo has no content stream"))
      val data = asDict(cv).get("Filter") match {
        case Some(PName("FlateDecode")) => inflate(raw)
        case Some(other) => throw new IllegalArgumentException(s"unsupported /Filter $other")
        case None => raw
      }
      val (ss, tj, ttj) = contentSpans(url, pageNo, data)
      spans ++= ss; nTj += tj; nTtj += ttj
    }
    PdfDoc(spans.result(), kids.size, size - 1, size, nTj, nTtj)
  }

  /** Reading order in PDF page space: pages ascending, columns left to right
    * (x-gap clustering), rows top to bottom = y DESCENDING. */
  def readingOrderText(ss: Seq[Span]): String = {
    val byPage = ss.groupBy(_.page_no).toSeq.sortBy(_._1)
    byPage.map { case (_, ps) =>
      val cols = LayoutText.columnOf(ps.map(_.x))
      ps.sortBy(s => (cols(s.x), -s.y, s.x)).map(_.span_text).mkString(" ")
    }.mkString(" ")
  }

  // ---- Spark surface --------------------------------------------------------------

  final case class PdfStats(url: String, n_pages: Long, n_objects: Long, xref_size: Long,
                            n_spans: Long, n_tj: Long, n_ttj: Long)

  /** documents -> (url, extracted_text) via render -> structural parse ->
    * layout reconstruction, wholly map-side (no shuffle). `compress` runs
    * the identical pipeline through /FlateDecode content streams. */
  def extractText(docs: DataFrame, compress: Boolean = false): Dataset[Extracted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val url = s"doc://$id"
      val doc = parse(url, render(id, text, compress))
      Extracted(url, readingOrderText(doc.spans))
    }
  }

  /** documents -> per-document structural stats, all read back out of the
    * parsed binary (page tree size, xref /Size, show-op mix). */
  def docStats(docs: DataFrame): Dataset[PdfStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val url = s"doc://$id"
      val doc = parse(url, render(id, text))
      PdfStats(url, doc.nPages.toLong, doc.nObjects.toLong, doc.xrefSize.toLong,
        doc.spans.size.toLong, doc.nTj, doc.nTtj)
    }
  }
}
