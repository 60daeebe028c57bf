package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.textops.Curate

/** Inverse decontamination: per-eval-item leakage ranking. */
class EvalLeakSpec extends AnyFunSuite {
  import SparkSuite._

  test("evalLeakReport: planted leaks counted, self-only items flagged false") {
    import spark.implicits._
    val w13 = (1 to 13).map("e" + _).mkString(" ")          // eval head gram
    val other = (1 to 13).map("f" + _).mkString(" ")        // second eval head
    val docs = Seq(
      (0L, w13 + " tail words here"),                        // eval doc itself
      (1L, "prefix " + w13),                                 // leak 1
      (2L, "clean doc with none of it at all padded out to thirteen words total okay"),
      (3L, w13),                                             // leak 2 (exact head)
      (41L, other))                                          // eval doc, no leaks
      .toDF("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 41 === 0)
    val got = Curate.evalLeakReport(docs, eval).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(0L) == ((3L, 0L, true)))   // docs 0, 1, 3 contain the head
    assert(got(41L) == ((1L, 41L, false))) // self only
  }

  test("duplicate gram inside one doc counts the doc once") {
    import spark.implicits._
    val w13 = (1 to 13).map("e" + _).mkString(" ")
    val docs = Seq(
      (0L, w13),
      (1L, w13 + " " + w13)) // gram appears at several offsets in doc 1
      .toDF("doc_id", "text")
    val eval = docs.filter(col("doc_id") === 0)
    val r = Curate.evalLeakReport(docs, eval).collect().head
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L)
  }
}
