package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.textops.Curate

/** Case/punct-insensitive decontamination: the fold must catch mangled
  * leaks that exact gram matching misses. */
class DecontaminateFoldSpec extends AnyFunSuite {
  import SparkSuite._

  test("foldForOverlap: lowercase, punctuation strip, space collapse, trim") {
    import spark.implicits._
    val got = Seq(
      " Hello,   WORLD!! x ",
      "already clean",
      "***").toDF("text")
      .select(Curate.foldForOverlap(col("text"))).as[String].collect()
    assert(got.toSeq == Seq("hello world x", "already clean", ""))
  }

  test("mangled leak is caught by the folded gate and missed by the exact one") {
    import spark.implicits._
    val head = (1 to 13).map("e" + _).mkString(" ")
    val docs = Seq(
      (0L, head + " tail"),                            // eval doc (0 % 41 == 0)
      // 12 % 7 == 5 AND even (targets eval doc (12%2)*41 = 0) ->
      // plantMangledLeak appends UPPER(comma-joined head)
      (12L, (1 to 15).map("w" + _).mkString(" ")),
      (6L, (1 to 15).map("v" + _).mkString(" ")))      // clean
      .toDF("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 41 === 0)
    val planted = Curate.plantMangledLeak(docs, eval)
    // byte-wise, the planted copy shares no 13-gram with the eval head
    val exact = Curate.contamination(planted, eval).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(exact(0L) && !exact(12L) && !exact(6L))
    val folded = Curate.contaminationFolded(planted, eval).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(folded(0L) && folded(12L) && !folded(6L))
  }
}
