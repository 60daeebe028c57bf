package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.textops.Curate

/** Paraphrase-tier decontamination: word-bigram-shingle Jaccard vs the
  * broadcast eval set. */
class NearDupDecontaminateSpec extends AnyFunSuite {
  import SparkSuite._

  test("near-copy flagged, exact-gram gates blind to it, clean doc untouched") {
    import spark.implicits._
    val evalText = (1 to 30).map("e" + _).mkString(" ")
    val docs = Seq(
      (0L, evalText),                                  // eval doc
      // 6 % 7 == 6, even -> replaced by eval text minus first word
      (6L, "whatever this was before planting"),
      (2L, (1 to 30).map("c" + _).mkString(" ")))      // clean
      .toDF("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 41 === 0)
    val got = Curate.decontaminateNearDup(Curate.plantEvalNearDup(docs, eval), eval)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(0L) == ((1L, 0L, true)))   // self: J = 1
    // near-copy: 28 of 29 shingles shared -> J = 28/30 >= 4/5
    assert(got(6L) == ((1L, 0L, true)))
    assert(got(2L) == ((0L, -1L, false)))
  }

  test("size screen never changes verdicts: tiny doc vs long eval rejected exactly") {
    import spark.implicits._
    val evalText = (1 to 30).map("e" + _).mkString(" ")
    val docs = Seq(
      (0L, evalText),
      (1L, "e1 e2 e3")) // subset but far too small: J = 2/29 < 4/5
      .toDF("doc_id", "text")
    val eval = docs.filter(col("doc_id") === 0)
    val got = Curate.decontaminateNearDup(docs, eval).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(0L) && !got(1L))
  }
}
