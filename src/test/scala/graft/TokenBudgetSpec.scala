package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.TokenBudget

class TokenBudgetSpec extends AnyFunSuite {
  import SparkSuite._

  test("select: quality-ordered greedy prefix, exact cum_before, boundary doc kept") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d"),        // ttr 1000, 4 tokens
      (1L, "a a a a a a"),    // ttr 166,  6 tokens
      (2L, "x y z"),          // ttr 1000, 3 tokens
      (3L, "p p q q"))        // ttr 500,  4 tokens
      .toDF("doc_id", "text")
    // order: doc0 (1000), doc2 (1000), doc3 (500), doc1 (166)
    val got = TokenBudget.select(docs, budget = 8L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(0L) == ((1000L, 4L, 0L, true)))
    assert(got(2L) == ((1000L, 3L, 4L, true)))
    assert(got(3L) == ((500L, 4L, 7L, true))) // straddles: 7 < 8, kept
    assert(got(1L) == ((166L, 6L, 11L, false)))
  }

  test("partitioning-invariant: same output under 1 and 8 input partitions") {
    import spark.implicits._
    val rows = (0L to 99L).map(i => (i, (0 to (i % 13).toInt).map(j => s"w${(i + j) % 7}").mkString(" ")))
    val a = TokenBudget.select(rows.toDF("doc_id", "text").repartition(1)).collect().sortBy(_.getLong(0))
    val b = TokenBudget.select(rows.toDF("doc_id", "text").repartition(8)).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("budget 0 selects nothing; cum_before still a total prefix sum") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val got = TokenBudget.select(docs, budget = 0L).collect()
    assert(got.forall(!_.getBoolean(4)))
    assert(got.map(_.getLong(3)).sorted.toSeq == (0L to 9L).map(_ * 3L))
  }
}
