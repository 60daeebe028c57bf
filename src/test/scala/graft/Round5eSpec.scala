package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: paragraph-grain code-switching audit, domain Pareto
  * concentration report, cumulative distinct via HLL register merge. */
class CodeswitchSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.textops.{Multilingual, TextHash}

  test("every bank paragraph's language class is pinned") {
    // the oracle hardcodes BankLang for paragraphs >= 1; if langIdDetail or a
    // bank phrase drifts, this catches it before the driver's DuckDB diff
    Multilingual.Bank.zip(Multilingual.BankLang).foreach { case (p, want) =>
      assert(TextHash.langIdDetail(p)._1 == want, s"bank phrase '$p'")
    }
  }

  test("codeswitchStats is a single map stage — zero shuffle") {
    val ds = Multilingual.codeswitchStats(
      Multilingual.plantCodeSwitch(spark.read.parquet(s"$sf/documents.parquet")))
    val fin = ds.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!fin.contains("Exchange"), s"expected a shuffle-free plan:\n$fin")
  }

  test("switch counting and dominant election match a driver-side recompute") {
    val got = SparkEntry.queries("codeswitch_stats")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5))))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val langs = TextHash.langIdDetail(text)._1 +:
        (1L until (3L + id % 3)).map(i => Multilingual.BankLang(((id + 7 * i) % 6).toInt))
      val counts = langs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (dl, dc) = counts.toSeq.minBy { case (l, c) => (-c, l) }
      val sw = langs.zip(langs.drop(1)).count(w => w._1 != w._2).toLong
      assert(got(id) == ((langs.size.toLong, counts.size.toLong, dl, dc, sw)), s"doc $id")
    }
  }
}

class DomainParetoSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val rows = SparkEntry.queries("domain_pareto")(spark, sf).collect()

  test("cumulative share is monotone and the final row closes at 10000 bp") {
    val byRank = rows.sortBy(_.getLong(2))
    def adj(f: org.apache.spark.sql.Row => Long) = {
      val v = byRank.map(f); v.zip(v.drop(1))
    }
    assert(adj(_.getLong(1)).forall(w => w._1 >= w._2),
      "token mass must be non-increasing in rank")
    assert(adj(_.getLong(3)).forall(w => w._1 < w._2),
      "cumulative tokens must strictly increase")
    assert(adj(_.getLong(4)).forall(w => w._1 <= w._2),
      "cumulative share must be non-decreasing")
    assert(byRank.last.getLong(4) == 10000L, "all domains together are the corpus")
    assert(byRank.last.getLong(3) == byRank.map(_.getLong(1)).sum)
  }

  test("the global window runs on the domain-grain aggregate, not corpus grain") {
    val q = SparkEntry.queries("domain_pareto")(spark, sf)
    q.queryExecution.toRdd.count()
    val fin = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the single-partition Window must sit ABOVE the domain roll-up: every
    // Window node appears before (= downstream of) the first HashAggregate
    // in the plan string, so only report-sized rows reach the ordered window
    val firstAgg = fin.indexOf("HashAggregate")
    assert(firstAgg >= 0, fin)
    val winIdxs = "(?m)Window".r.findAllMatchIn(fin).map(_.start).toSeq
    assert(winIdxs.nonEmpty && winIdxs.forall(_ < firstAgg),
      s"a Window consumed pre-aggregation (corpus-grain) rows:\n$fin")
  }
}

class SketchMergeSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val cum = SparkEntry.queries("hll_cumulative")(spark, sf).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("merged estimate is monotone non-decreasing day over day") {
    cum.groupBy(_._1).foreach { case (t, rs) =>
      val byDay = rs.sortBy(_._2)
      val est = byDay.map(_._3); val ex = byDay.map(_._4)
      assert(est.zip(est.drop(1)).forall(w => w._1 <= w._2),
        s"type $t: registers only grow, so the estimate must too")
      assert(ex.zip(ex.drop(1)).forall(w => w._1 <= w._2), s"type $t exact")
    }
  }

  test("sliding-window merge is bounded by the cumulative merge, equal while history fits") {
    val slid = SparkEntry.queries("hll_sliding")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(slid.keySet == cum.map(r => (r._1, r._2)).toSet)
    val firstDay = cum.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    cum.foreach { case (t, day, cEst, cEx) =>
      val (wEst, wEx) = slid((t, day))
      // a trailing window's registers are a subset of the cumulative ones
      assert(wEst <= cEst && wEx <= cEx, s"($t, $day)")
      // ...and identical while the whole history fits inside the window
      if (day - firstDay(t) < 7) assert(wEst == cEst && wEx == cEx, s"($t, $day)")
    }
  }

  test("the last day's merged sketch equals the whole-corpus hll_distinct sketch") {
    // register-wise max over per-day sketches == one sketch over all values:
    // the mergeability property the op exists to demonstrate, cross-checked
    // against the independent HllSketchAgg Catalyst aggregate
    val direct = SparkEntry.queries("hll_distinct")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    cum.groupBy(_._1).foreach { case (t, rs) =>
      val last = rs.maxBy(_._2)
      assert((last._3, last._4) == direct(t),
        s"type $t: prefix-merged sketch diverged from the direct sketch")
    }
  }
}
