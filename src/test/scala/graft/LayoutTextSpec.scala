package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.layout.LayoutText

class LayoutTextSpec extends AnyFunSuite {

  private def words(n: Int): String = (1 to n).map("w" + _).mkString(" ")

  test("round trip: scrambled spans reconstruct the exact text for all corpus sizes") {
    for (id <- 0L until 8L; n <- Seq(1, 4, 5, 10, 24, 47, 48, 49, 73, 96, 97, 100)) {
      val text = words(n)
      val ss = LayoutText.spans(id, text)
      assert(LayoutText.readingOrderText(ss) == text, s"id=$id n=$n")
    }
  }

  test("emission order is scrambled (not already reading order) for a realistic doc") {
    val ss = LayoutText.spans(5L, words(100))
    val inOrder = LayoutText.readingOrderText(ss)
    val naive = ss.map(_.span_text).mkString(" ")
    assert(naive != inOrder)
  }

  test("naive (y, x) sort interleaves columns — column clustering is load-bearing") {
    val ss = LayoutText.spans(0L, words(96)) // 24 lines, 2 full pages
    val page0 = ss.filter(_.page_no == 0)
    val naive = page0.sortBy(s => (s.y, s.x)).map(_.span_text).mkString(" ")
    val correct = LayoutText.readingOrderText(page0)
    assert(naive != correct)
  }

  test("column clustering splits on the x gap") {
    assert(LayoutText.columnOf(Seq(100, 700, 100, 130)) == Map(100 -> 0, 130 -> 0, 700 -> 1))
    assert(LayoutText.columnOf(Seq(100, 150, 200)) == Map(100 -> 0, 150 -> 0, 200 -> 0))
  }

  test("multi-page documents page-break correctly") {
    val text = words(96) // 24 spans -> 2 pages of 12 lines
    val ss = LayoutText.spans(3L, text)
    assert(ss.map(_.page_no).distinct.sorted == Seq(0, 1))
    assert(LayoutText.readingOrderText(ss) == text)
  }

  test("spark extraction equals the raw text for every document at sf0.001") {
    import SparkSuite._
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("layout_reading_order")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) => assert(got(s"doc://$id") == text, s"doc $id") }
  }
}
