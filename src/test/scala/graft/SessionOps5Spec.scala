package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class CusumSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.events.Cusum

  test("hourlyBursts matches a driver-side recurrence recompute on sf0.001 (plant included)") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val raw = events.select("event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[LocalDateTime](2)))
    val plantedBase = 1705320000L / 3600L // epoch('2024-01-15 12:00') // 3600
    val buckets = scala.collection.mutable.Map.empty[(String, Long), Long].withDefaultValue(0L)
    raw.foreach { case (id, t, ts) =>
      buckets((t, ts.toEpochSecond(java.time.ZoneOffset.UTC) / 3600L)) += 1
      if (id % 5 == 0) buckets((t, plantedBase + id % 3)) += 1
    }
    val expected = buckets.keys.map(_._1).toSeq.distinct.sorted.flatMap { t =>
      val bs = buckets.collect { case ((`t`, b), n) => b -> n }
      val (lo, hi) = (bs.keys.min, bs.keys.max)
      val h = hi - lo + 1
      val total = bs.values.sum
      val thr = (total + h - 1) / h + 1
      var s = 0L
      (lo to hi).map { b =>
        val n = bs.getOrElse(b, 0L)
        s = math.max(0L, s + n - thr)
        (t, b, n, thr, s, if (s >= thr + 2) 1L else 0L)
      }
    }
    val got = Cusum.hourlyBursts(Cusum.plantBurst(events)).orderBy("event_type", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    val bursts = got.count(_._6 == 1L)
    assert(bursts > 0 && bursts < got.length / 2, s"degenerate burst rate $bursts/${got.length}")
  }

  test("CUSUM hand case: alarm on the spike, drain through quiet and empty buckets") {
    import spark.implicits._
    val h0 = LocalDateTime.of(2024, 3, 1, 0, 30)
    def at(hoursLater: Int, k: Int) =
      (0 until k).map(i => (100L * hoursLater + i, "a", h0.plusHours(hoursLater.toLong)))
    // counts per hour: 12, 0, 1, 3 -> total 16 over H=4, thr = ceil(4)+1 = 5
    val ev = (at(0, 12) ++ at(2, 1) ++ at(3, 3)).toDF("event_id", "event_type", "ts")
    val got = Cusum.hourlyBursts(ev).orderBy("bucket").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // S: max(0,12-5)=7 ALARM(>=7); 7-5=2; max(0,2+1-5)=0; max(0,3-5)=0
    assert(got == Seq((12L, 5L, 7L, 1L), (0L, 5L, 2L, 0L), (1L, 5L, 0L, 0L), (3L, 5L, 0L, 0L)))
  }
}

class ZOrderSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.layout.ZOrder

  test("morton interleave puts d1 in odd and d2 in even bit positions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Seq((21L, 10L)).toDF("d1", "d2")
      .select(ZOrder.morton(col("d1"), col("d2"), 5).as("z")).head.getLong(0)
    // d1=0b10101 -> bits 1,5,9; d2=0b01010 -> bits 2,6
    assert(r == (2L + 32L + 512L) + (4L + 64L))
  }

  test("layout audit: every file is an 8x8 tile and z-order prunes the second dim, a linear sort doesn't") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val audit = ZOrder.layoutAudit(docs).orderBy("file_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(audit.map(_._2).sum == docs.count())
    audit.foreach { f =>
      assert(f._4 - f._3 <= 7 && f._6 - f._5 <= 7, s"file not an 8x8 tile: $f")
    }
    // data-skipping audit: files whose [min_d2, max_d2] covers a probe value,
    // vs the same file count under a doc_id-sorted linear 16-file layout
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).length.toLong % 32L)).sortBy(_._1)
    val chunk = math.max(1, (rows.length + 15) / 16)
    val linear = rows.grouped(chunk).map(g => (g.map(_._2).min, g.map(_._2).max)).toSeq
    val probes = 0L until 32L
    val zHits = probes.map(c => audit.count(f => f._5 <= c && c <= f._6)).sum
    val linHits = probes.map(c => linear.count(f => f._1 <= c && c <= f._2)).sum
    assert(zHits * 2 <= linHits, s"z-order should prune d2 at least 2x: z=$zHits linear=$linHits")
  }
}

class DsirSelectSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.textops.Curate

  test("dsirSelect is the exact (weight DESC, id) head of dsirWeights, ranked") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val weights = Curate.dsirWeights(docs).select("doc_id", "weight_bits").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = weights.sortBy(w => (-w._2, w._1)).take(100)
      .zipWithIndex.map { case ((id, w), i) => (id, w, i + 1L) }.toSeq
    val got = Curate.dsirSelect(docs).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("dsirSelect top-k plans as TakeOrderedAndProject, not a global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Curate.dsirSelect(docs).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"), s"expected TOAP:\n$plan")
  }
}
