package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.InvertedIndex

class PostingGapsSpec extends AnyFunSuite {
  import SparkSuite._

  test("postingGaps: delta-gap varbyte sizes, first-posting-as-is, df=1 null gap") {
    import spark.implicits._
    // term "a b" posted in docs 0, 200, 201; "b c" only in doc 200
    val docs = Seq(
      (0L, "a b x"),
      (200L, "a b c"),
      (201L, "a b y"))
      .toDF("doc_id", "text")
    val got = InvertedIndex.postingGaps(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val ab = got("a b")
    // encoded: [0, 200, 1] -> bytes 1 + 2 + 1 = 4 (200 needs 8 bits -> 2 varbytes)
    assert(ab.getLong(1) == 3L && ab.getLong(2) == 4L && ab.getLong(3) == 24L)
    assert(ab.getLong(4) == 200L)
    val bc = got("b c")
    // encoded: [200] -> 2 bytes; no gaps -> max_gap null
    assert(bc.getLong(1) == 1L && bc.getLong(2) == 2L && bc.isNullAt(4))
    // per-doc duplicate bigram ("a b" twice in one doc) counts once
    val dup = InvertedIndex.postingGaps(
      Seq((7L, "a b a b")).toDF("doc_id", "text")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dup("a b") == 1L)
  }

  test("varbyte boundaries: 127 is 1 byte, 128 is 2") {
    import spark.implicits._
    val docs = Seq((0L, "t t"), (127L, "t t"), (255L, "t t")).toDF("doc_id", "text")
    // postings [0,127,255]: encoded [0,127,128] -> 1 + 1 + 2 = 4 bytes
    val r = InvertedIndex.postingGaps(docs).collect().head
    assert(r.getLong(2) == 4L && r.getLong(4) == 128L)
  }
}
