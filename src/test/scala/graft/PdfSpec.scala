package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.layout.Pdf

class PdfSpec extends AnyFunSuite {

  private def words(n: Int): String = (1 to n).map("w" + _).mkString(" ")
  private def roundTrip(id: Long, text: String): String = {
    val doc = Pdf.parse(s"doc://$id", Pdf.render(id, text))
    Pdf.readingOrderText(doc.spans)
  }

  test("render/parse round trip is byte-identical across sizes and ids") {
    for (id <- 0L until 6L; n <- Seq(1, 3, 4, 5, 12, 47, 48, 49, 96, 97, 200)) {
      val text = words(n)
      assert(roundTrip(id, text) == text, s"id=$id n=$n")
    }
  }

  test("string-literal escaping round-trips parens, backslashes, and newlines") {
    for (s <- Seq("a(b)c", "back\\slash", "close)only", "open(only", "nest((x))", "mix\\)\\(")) {
      assert(roundTrip(7L, s"$s tail word here") contains s)
    }
    assert(roundTrip(8L, "a(b (c) d)\\e f g h") == "a(b (c) d)\\e f g h")
  }

  test("empty and single-word documents render one page and round-trip") {
    assert(roundTrip(1L, "") == "")
    assert(roundTrip(1L, "solo") == "solo")
    val doc = Pdf.parse("doc://1", Pdf.render(1L, ""))
    assert(doc.nPages == 1 && doc.nObjects == 5 && doc.xrefSize == 6)
  }

  test("kerned TJ arrays carry inter-word spaces only as kerns (parser must rebuild them)") {
    val text = words(8) // 2 spans; span idx 1 is odd + multi-word => TJ
    val bytes = Pdf.render(3L, text)
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(raw.contains("TJ"), "expected a TJ show op")
    assert(raw.contains(") -250 ("), "expected the space to exist only as a kern")
    assert(roundTrip(3L, text) == text)
  }

  test("positioning mixes absolute Tm and relative Td and both are tracked") {
    val raw = new String(Pdf.render(4L, words(40)), StandardCharsets.ISO_8859_1)
    assert(raw.contains(" Tm\n") && raw.contains(" Td\n"))
    assert(roundTrip(4L, words(40)) == words(40))
  }

  test("objects are located ONLY via xref offsets: corrupting one entry breaks the parse") {
    val bytes = Pdf.render(5L, words(30))
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val xref = raw.indexOf("xref\n0 ")
    // first in-use entry line sits after the free entry; bump its offset by one
    val entry = raw.indexOf("\n", raw.indexOf("65535 f")) + 1
    val mutated = raw.substring(0, entry) + "0000000001" + raw.substring(entry + 10)
    assert(xref > 0 && mutated.length == raw.length)
    intercept[Exception] {
      Pdf.parse("doc://5", mutated.getBytes(StandardCharsets.ISO_8859_1))
    }
  }

  test("xref entries are exactly 20 bytes and startxref points at the table") {
    val raw = new String(Pdf.render(6L, words(60)), StandardCharsets.ISO_8859_1)
    val xrefOff = raw.indexOf("\nxref\n") + 1
    val start = raw.indexOf("startxref\n") + "startxref\n".length
    assert(raw.substring(start).takeWhile(_.isDigit).toInt == xrefOff)
    val lines = raw.substring(xrefOff).linesIterator.drop(2).take(raw.substring(xrefOff).linesIterator.drop(1).next().split(" ")(1).toInt).toSeq
    assert(lines.forall(_.length == 19), "each entry is 19 chars + LF = 20 bytes")
  }

  test("emission order inside a content stream is scrambled, not reading order") {
    val bytes = Pdf.render(9L, words(96))
    val doc = Pdf.parse("doc://9", bytes)
    val naive = doc.spans.map(_.span_text).mkString(" ")
    assert(naive != Pdf.readingOrderText(doc.spans))
  }

  test("parsed op counts match the closed form used by the oracle") {
    for (n <- Seq(1, 4, 5, 8, 9, 13, 48, 49, 97)) {
      val text = words(n)
      val nw = text.split(" ", -1).length
      val nlines = (nw + 3) / 4
      val lastw = nw - 4 * (nlines - 1)
      val ttj = (nlines - 1) / 2 + (if ((nlines - 1) % 2 == 1 && lastw >= 2) 1 else 0)
      val doc = Pdf.parse("doc://2", Pdf.render(2L, text))
      assert(doc.spans.size == nlines && doc.nTtj == ttj && doc.nTj == nlines - ttj, s"n=$n")
      assert(doc.nPages == (nlines + 11) / 12)
    }
  }

  test("spark extraction equals the raw text for every document at sf0.001") {
    import SparkSuite._
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("pdf_text_extract")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) => assert(got(s"doc://$id") == text, s"doc $id") }
  }
}
