package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.Multimodal

/** Perceptual audio dedup: energy-delta-sign fingerprint + Manku candidates. */
class AudioDedupSpec extends AnyFunSuite {
  import SparkSuite._

  test("fingerprint is exactly invariant to phase inversion and uniform gain") {
    val s = Array.tabulate(100)(i => Multimodal.audioSample(7L, i))
    val fp = Multimodal.audioFingerprint(s)
    assert(Multimodal.audioFingerprint(s.map(v => if (v == -32768) v else -v)) == fp)
    assert(Multimodal.audioFingerprint(s.map(_ * 2)) == fp) // ints, no wrap here
    // content change flips bits: zero out the second half
    val cut = s.zipWithIndex.map { case (v, i) => if (i >= 50) 0 else v }
    assert(Multimodal.audioFingerprint(cut) != fp)
  }

  test("flipped payload round-trips through the real WAV parser to flipped samples") {
    val base = Multimodal.parseWav(Multimodal.wavPayload(5L)).get._2
    val flip = Multimodal.parseWav(Multimodal.wavPayloadFlipped(5L)).get._2
    assert(base.length == flip.length)
    base.zip(flip).foreach { case (a, b) =>
      if (a == -32768) assert(b == -32768) else assert(b == -a)
    }
  }

  test("audioNearDupPairs finds every planted twin at hamming 0") {
    import spark.implicits._
    val docs = (0L to 19L).map(i => (i, "unused")).toDF("doc_id", "text")
    val pairs = Multimodal.audioNearDupPairs(Multimodal.mediaWithAudioTwins(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twins = pairs.filter { case (a, b, _) => b - a == 1000000L }
    assert(twins.length == 20 && twins.forall(_._3 == 0L))
  }
}
