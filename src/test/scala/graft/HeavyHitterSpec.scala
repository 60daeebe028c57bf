package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.HeavyHitters

class HeavyHitterSpec extends AnyFunSuite {
  import SparkSuite._

  test("lossyCandidates keeps every key above eps and bounds table size") {
    // 10,000-item stream: key "hot" every 10th item (10% >> eps = 0.5%),
    // "warm" every 150th (~0.67% > eps), the rest all-distinct cold keys.
    val stream = (0 until 10000).map { i =>
      if (i % 10 == 0) "hot" else if (i % 150 == 1) "warm" else s"cold$i"
    }
    val out = HeavyHitters.lossyCandidates(stream.iterator, 400).toVector
    val (sentinels, keys) = out.partition(_._1 == null)
    assert(sentinels == Vector((null, 10000L)))
    val kept = keys.map(_._1).toSet
    assert(kept.contains("hot") && kept.contains("warm"))
    // lossy-counting state bound: survivors at any boundary <= 1/eps per
    // bucket generation; after the final partial bucket the table holds the
    // guaranteed keys plus at most one bucket's worth of fresh cold keys.
    assert(kept.size <= 400 + 2, s"table leaked: ${kept.size}")
  }

  test("heavyHitters equals brute force and is partition-invariant") {
    import spark.implicits._
    // skewed synthetic stream: key k_j has multiplicity (40 - j)^2 for
    // j in 0..39 -> shares from ~7.6% down to ~0.005%; threshold 1% keeps
    // a strict, boundary-exercising prefix.
    val rows = (0 until 40).flatMap(j => Seq.fill((40 - j) * (40 - j))(s"k$j"))
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * 100L >= rows.size.toLong }
    for (parts <- Seq(1, 3, 8)) {
      val ds = spark.createDataset(rows).repartition(parts)
      val got = HeavyHitters.heavyHitters(ds, 1L, 100L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.map(t => t._1 -> t._2).toMap == expected, s"parts=$parts")
      got.foreach { case (_, c, bp) =>
        assert(bp == c * 10000L / rows.size, "share_bp arithmetic")
      }
    }
  }

  test("corpus bigram hitters include every planted boilerplate bigram") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hh = HeavyHitters.heavyHitters(HeavyHitters.bigramTerms(docs))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val plantedBigrams = textops.Dedup.BoilerLine.split(" ")
      .sliding(2).map(_.mkString(" ")).toVector
    plantedBigrams.foreach { b =>
      assert(hh.contains(b), s"missing planted bigram '$b'")
      assert(hh(b) >= 50L, s"'$b' share ${hh(b)} bp below threshold")
    }
  }
}
