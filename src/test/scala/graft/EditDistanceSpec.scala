package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}

import graft.textops.EditDistance

/** Banded edit-distance kernel + the pair-verification stage. */
class EditDistanceSpec extends AnyFunSuite {
  import SparkSuite._

  test("boundedEdit matches known distances") {
    assert(EditDistance.boundedEdit("kitten", "sitting", 10) == 3)
    assert(EditDistance.boundedEdit("", "", 0) == 0)
    assert(EditDistance.boundedEdit("", "abc", 5) == 3)
    assert(EditDistance.boundedEdit("abc", "", 5) == 3)
    assert(EditDistance.boundedEdit("abc", "abc", 0) == 0)
    // cap semantics: anything above k reports exactly k+1
    assert(EditDistance.boundedEdit("", "abcdef", 3) == 4)
    assert(EditDistance.boundedEdit("aaaa", "bbbb", 2) == 3)
    assert(EditDistance.boundedEdit("abcdefgh", "abcdefgh", 0) == 0)
    assert(EditDistance.boundedEdit("abcdefgh", "xbcdefgh", 0) == 1)
  }

  test("verifyPairs: twins pass the 20% gate, decoys fail, distances exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "key agg row scan slow fast table value part hash value table part a row fast merge"),
      (1L, "batch window spark order data column agg join small line customer query line value"),
      (2L, "small fast slow filter value small value table the part data window the row a window"))
      .toDF("doc_id", "text")
    val got = EditDistance.verifyPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // 3 twin pairs + 2 decoy pairs (doc 2's successor twin doesn't exist)
    assert(got.size == 5)
    for (id <- 0L to 2L) {
      val r = got((id, id + 1000000L))
      assert(r.getBoolean(4), s"twin pair $id should verify")
      assert(r.getLong(2) > 0, "planted edits are real edits")
    }
    for (id <- 0L to 1L) {
      val r = got((id, id + 1000001L))
      assert(!r.getBoolean(4), s"decoy pair $id should be rejected")
      // decoy distance is capped at exactly floor(maxLen/5) + 1
      assert(r.getLong(2) == r.getLong(3) / 5 + 1)
    }
  }

  test("verifyPairs plan: two hash joins, no cartesian, no corpus re-explode") {
    import spark.implicits._
    val docs = (0L to 29L).map(i => (i, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = EditDistance.verifyPairs(docs)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }
}

object EditDistanceProps extends Properties("EditDistance") {
  private val sGen = Gen.choose(0, 40).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))

  private def classicDp(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  property("boundedEdit == min(classic DP, k+1) for all strings and caps") =
    Prop.forAll(sGen, sGen, Gen.choose(0, 45)) { (a, b, k) =>
      EditDistance.boundedEdit(a, b, k) == math.min(classicDp(a, b), k + 1)
    }
}
