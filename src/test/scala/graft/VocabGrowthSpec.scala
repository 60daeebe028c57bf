package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.VocabGrowth

class VocabGrowthSpec extends AnyFunSuite {
  import SparkSuite._

  test("growth: checkpoints, cumulative vocab/bigram/token curves, new_* diffs") {
    import spark.implicits._
    // 5 docs -> checkpoints {1, 2, 4, 5}
    val docs = Seq(
      (0L, "a b a"),     // vocab {a,b}, bigrams {a b, b a}, 3 tokens
      (1L, "a b c"),     // +{c}; +{b c}
      (2L, "c c"),       // +{}; +{c c}
      (3L, "d"),         // +{d}; no bigram (single word)
      (4L, "a d"))       // +{}; +{a d}
      .toDF("doc_id", "text")
    val got = VocabGrowth.growth(docs).orderBy("docs_seen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 3L, 2L, 2L),
      (2L, 3L, 3L, 6L, 1L, 1L),
      (4L, 4L, 4L, 9L, 1L, 1L),
      (5L, 4L, 5L, 11L, 0L, 1L)))
  }

  test("single-doc corpus: one checkpoint, no bigram explosion on 1-word text") {
    import spark.implicits._
    val got = VocabGrowth.growth(Seq((0L, "solo")).toDF("doc_id", "text")).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 1L &&
      got(0).getLong(2) == 0L && got(0).getLong(3) == 1L)
  }

  test("plan: corpus-grain work is the two first-seen aggs; window is checkpoint-grain") {
    import spark.implicits._
    val docs = (0L to 63L).map(i => (i, "a b c d")).toDF("doc_id", "text")
    val df = VocabGrowth.growth(docs)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), plan)
    // the explode never feeds the window directly: every Generate is below an agg
    assert(df.orderBy("docs_seen").collect().last.getLong(3) == 256L)
  }
}
