package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.{Cdc, TextHash}

class CdcSpec extends AnyFunSuite {
  import SparkSuite._

  test("chunks partition the document losslessly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (_, text) =>
      val cs = Cdc.chunkStrings(text)
      assert(cs.map(_._3).mkString(" ") == text)
      assert(cs.map(_._2).sum == text.split(" ", -1).length)
      // start offsets are the running token count
      assert(cs.map(_._1) == cs.scanLeft(0)((acc, c) => acc + c._2).init.map(identity))
    }
  }

  test("boundaries re-synchronize after a prefix edit (the CDC property, off-fixture)") {
    val base = (1 to 120).map(i => s"tok${i * 7 % 31}w$i").mkString(" ")
    val edited = "inserted " + base
    val a = Cdc.chunkStrings(base).map(_._3)
    val b = Cdc.chunkStrings(edited).map(_._3)
    assert(a.size > 3, "fixture must produce several chunks")
    // every chunk after the first original boundary is byte-identical again
    // (the insert can at most add ONE extra early boundary — the single new
    // window position is the one containing the inserted token)
    assert(b.takeRight(a.size - 1) == a.tail, "CDC must re-sync after the edit")
    assert(b.size - a.size <= 1)
    // the same edit under fixed stride shifts EVERY chunk
    val fa = base.split(" ", -1).grouped(8).map(_.mkString(" ")).toSet
    val fb = edited.split(" ", -1).grouped(8).map(_.mkString(" ")).toSet
    assert((fb & fa).isEmpty, "fixed stride must share nothing under a one-token prefix")
  }

  test("short documents (< window) yield exactly one whole-text chunk") {
    for (t <- Seq("", "a", "a b", "a b c")) {
      assert(Cdc.chunkStrings(t) == IndexedSeq((0, t.split(" ", -1).length, t)))
    }
  }

  test("chunking is one map stage; report shuffles carry no chunk text") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fin = Cdc.chunks(docs).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!fin.contains("Exchange"), s"chunking must not shuffle:\n$fin")

    val rep = Cdc.shiftReport(Cdc.plantShifted(docs))
    rep.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => Nil
      }
      (p +: p.children.flatMap(walk)) ++ nested
    }
    val shuffles = walk(rep.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec if s.outputPartitioning.isInstanceOf[HashPartitioning] => s
    }
    assert(shuffles.nonEmpty)
    for (s <- shuffles; a <- s.output)
      assert(a.dataType != StringType,
        s"string attribute $a crosses a hash shuffle - chunk text must stay map-side")
  }

  test("chunk hashes are content identities (same text, same hash, wherever it appears)") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    assert(TextHash.fnv64(t1) == TextHash.fnv64(new String(t1.toCharArray)))
  }
}
