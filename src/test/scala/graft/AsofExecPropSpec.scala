package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.plans.AsofExec

/** Property hardening for the physical as-of operator: random snapshot/event
  * tables — including equal-(k,t) snapshot ties, duplicate events, events
  * before any snapshot, keys on one side only, and empty sides — must match
  * a pure-Scala reference model of the documented semantics (latest snap_t
  * <= event_t inclusive; equal-(k,t) snapshots resolve to the HIGHEST
  * version; unmatched -> -1/-1), under a random partitioning. */
object AsofExecPropSpec extends Properties("AsofJoinExec") {
  import SparkSuite.spark

  // each shot runs a real Spark job; 25 diverse tables is plenty of surface
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val snapGen = Gen.listOfN(60,
    for {
      k <- Gen.choose(0L, 7L)
      t <- Gen.choose(0L, 40L)
      v <- Gen.choose(0L, 9L)
    } yield (k, t, v))

  private val eventGen = Gen.listOfN(80,
    for {
      k <- Gen.choose(0L, 9L) // some keys have no snapshots at all
      t <- Gen.choose(-5L, 45L)
    } yield (k, t))

  private def model(snaps: Seq[(Long, Long, Long)],
                    events: Seq[(Long, Long, Long)]): Map[Long, (Long, Long, Long)] =
    events.map { case (k, t, id) =>
      val eligible = snaps.filter(s => s._1 == k && s._2 <= t)
      if (eligible.isEmpty) id -> ((k, -1L, -1L))
      else {
        // latest t wins; at equal t the highest version (documented rule)
        val best = eligible.maxBy(s => (s._2, s._3))
        id -> ((k, best._3, t - best._2))
      }
    }.toMap

  property("equals the reference model on random inputs and partitionings") =
    Prop.forAll(snapGen, eventGen, Gen.choose(1, 5)) { (sRaw, eRaw, parts) =>
      import spark.implicits._
      // the operator contract presumes distinct (k, t, version) snapshot
      // rows (a capture log has no exact-duplicate captures); events may
      // repeat freely and get distinct ids
      val snaps = sRaw.distinct
      val events = eRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val got = AsofExec.asof(
          snaps.toDF("k", "t", "version").repartition(parts),
          events.toDF("k", "t", "event_id").repartition(parts + 1))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      got == model(snaps, events)
    }
}
