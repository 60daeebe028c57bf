package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.Ann

/** Topic-balanced sampling: Hamilton quotas over IVF cells. */
class ClusterBalanceSpec extends AnyFunSuite {
  import SparkSuite._

  private def synth(n: Int) = {
    import spark.implicits._
    // two tight clusters in 64-dim space: ids < n/2 near +1 on dim 0,
    // the rest near +1 on dim 1 — cell assignment must separate them
    (0 until n).map { i =>
      val v = Array.fill(64)(0.001f * (i % 7))
      if (i < n / 2) v(0) = 1.0f else v(1) = 1.0f
      (i.toLong, v.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("exact budget, proportional quotas, deterministic under repartitioning") {
    val emb = synth(64)
    val a = Ann.clusterBalancedSample(emb, nlist = 4, budget = 10L)
      .collect().map(_.toString).sorted.toSeq
    assert(a.length == 10)
    val b = Ann.clusterBalancedSample(emb.repartition(7), nlist = 4, budget = 10L)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("every cell with a positive quota is represented; quota never exceeds cell size") {
    val emb = synth(48)
    val rows = Ann.clusterBalancedSample(emb, nlist = 4, budget = 12L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 12)
    rows.foreach { case (_, rnk, quota, nCell) =>
      assert(rnk <= quota && quota <= nCell)
    }
    // sum of per-cell sampled counts equals the budget
    val perCell = rows.groupBy(_._1).map { case (c, rs) => c -> rs.length }
    assert(perCell.values.sum == 12)
  }
}
