package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textops.{BpeTrain, SequencePack, TextHash}
import graft.webtext.HostRank

/** Unit semantics for the round-5 ops: BPE apply (encode/fertility),
  * deterministic training shuffle, reciprocal-link detection. */
class SessionOps5Spec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  // ---- BpeTrain.encode ----

  /** Independent greedy-left recompute: index-scanning loop, not the
    * engine's list-pattern foldMerge. */
  private def nTokRef(w: String, merges: Seq[(String, String)]): Int = {
    var toks = w.map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks.length
  }

  test("bpe encode: hand-derivable words under the fixture merges") {
    // er -> [er]; mer -> m,e,r -> m,er -> mer (rule 6 consumes rule 1's
    // output); water -> w,a,t,e,r -> w,at,er; lull -> l,u,l,l -> lu,l,l
    val docs = Seq(
      (1L, "er mer water"), (2L, "lull in order"), (3L, "stow stow")
    ).toDF("doc_id", "text")
    val got = BpeTrain.encode(docs, BpeTrain.FixtureMerges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 1L + 1L + 3L)))
    // in -> [in]; order -> o,r,d,e,r -> or,d,er (3)
    assert(got(2L) == ((3L, 3L + 1L + 3L)))
    // stow -> s,t,o,w -> st,ow (2); duplicate word exercises the c multiplier
    assert(got(3L) == ((2L, 4L)))
    // cross-check the hand values against the independent scanner
    assert(nTokRef("mer", BpeTrain.FixtureMerges) == 1)
    assert(nTokRef("water", BpeTrain.FixtureMerges) == 3)
    assert(nTokRef("lull", BpeTrain.FixtureMerges) == 3)
    assert(nTokRef("order", BpeTrain.FixtureMerges) == 3)
    assert(nTokRef("stow", BpeTrain.FixtureMerges) == 2)
  }

  test("bpe encode: sf0.001 equals the independent per-word recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val ws = r.getString(1).split(" ", -1).filter(_.nonEmpty)
      r.getLong(0) -> ((ws.length.toLong,
        ws.map(w => nTokRef(w, BpeTrain.FixtureMerges).toLong).sum))
    }.toMap
    val got = BpeTrain.encode(docs, BpeTrain.FixtureMerges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // fertility must be > 1000 milli (multi-char words can't all be 1 token
    // under 8 merges) and well under the char count
    val (nw, nt) = got.values.reduce((x, y) => (x._1 + y._1, x._2 + y._2))
    assert(nt > nw && nt * 1000 / nw < 6000, s"fertility ${nt * 1000 / nw}")
  }

  test("bpe encode: the corpus text is scanned once (vocab-grain encode)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = BpeTrain.encode(docs, BpeTrain.FixtureMerges)
    df.collect()
    // AQE's toString appends an "== Initial Plan ==" copy — inspect only the
    // final plan section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // one Generate (explode) of the token stream; the vocab side must reuse
    // the (doc,word) exchange (ReusedExchange), not re-explode the corpus
    assert(plan.sliding("Generate explode".length).count(_ == "Generate explode") <= 1,
      s"corpus must explode once:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"vocab branch must reuse the (doc,word) exchange:\n$plan")
  }

  test("sequence_pack_bpe: offsets are the exact cumsum of encoded counts; no Window") {
    val df = SparkEntry.queries("sequence_pack_bpe")(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    // independent recompute: per-doc nTokRef sums, cumsum in doc_id order
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => nTokRef(w, BpeTrain.FixtureMerges).toLong).sum)
      .sortBy(_._1)
    var off = 0L
    val expected = docs.map { case (id, nt) =>
      val start = off
      off += nt + 1
      (id, (nt, start, start / 2048, (start + nt) / 2048))
    }
    assert(got.sameElements(expected))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"token cumsum must not plan as a Window:\n$plan")
  }

  // ---- Curate.dsirWeights ----

  test("dsir weights: sf0.001 equals the independent bit-length recompute; LM join broadcasts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase)
    def tris(lt: String): Seq[String] =
      if (lt.length < 3) Seq.empty else (0 to lt.length - 3).map(i => lt.substring(i, i + 3))
    val ct = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cr = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((id, lt) <- rows) {
      if (id % 10 == 0) tris(lt).foreach(t => ct(t) += 1)
      if (id % 10 >= 5) tris(lt).foreach(t => cr(t) += 1)
    }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def blen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expected = rows.filter(_._2.length >= 3).map { case (id, lt) =>
      val ts = tris(lt)
      val s = ts.map(t => blen(ct(t) + 1) - blen(cr(t) + 1)).sum
      id -> ((ts.length.toLong, s + ts.length * (blen(tr + 1) - blen(tt + 1))))
    }.toMap
    val df = graft.textops.Curate.dsirWeights(docs)
    val got = df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // weights must spread (target and raw slices differ), not collapse to one value
    assert(got.values.map(_._2).toSet.size > 10)
    // the trigram-LM scoring join must broadcast — the exploded corpus
    // stream never hash-shuffles on the string trigram key
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), s"LM join must broadcast:\n$plan")
  }

  test("entropy quality: sf0.001 equals the bit-length recompute; junk scores low") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def blen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val t = r.getString(1)
      val n = t.length.toLong
      val eb = t.groupBy(identity).values
        .map(g => g.length.toLong * (blen(n) - blen(g.length.toLong))).sum
      r.getLong(0) -> ((n, eb, eb * 1000 / n))
    }.toMap
    val got = graft.textops.Curate.entropyQuality(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // the gate separates junk from prose: repeated padding scores far below
    // the corpus band
    val junk = Seq((1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")).toDF("doc_id", "text")
    val jm = graft.textops.Curate.entropyQuality(junk).collect()(0).getLong(3)
    assert(jm == 0L, s"constant padding must score 0 entropy, got $jm")
    assert(got.values.map(_._3).min > 2000, "prose must sit well above the junk band")
  }

  // ---- SequencePack.trainShuffle ----

  test("train shuffle: deterministic, salt-sensitive, key matches fnv64") {
    val docs = (0L until 100L).map(i => (i, s"t $i")).toDF("doc_id", "text")
    def run(salt: String) = SequencePack.trainShuffle(docs, salt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = run("shuf")
    val b = run("shuf")
    assert(a.sameElements(b), "same salt must reproduce the identical order")
    val c = run("epoch2")
    assert(!a.map(_._3).sameElements(c.map(_._3)),
      "a different salt must land a different permutation")
    // permutation + order law on the salted run too
    assert(c.map(_._3).sorted.sameElements(1L to 100L))
    c.foreach { case (id, k, _) =>
      assert(k == (TextHash.fnv64(s"epoch2:$id") & Long.MaxValue))
    }
    val byKey = c.sortBy(t => (t._2, t._1)).map(_._1)
    assert(byKey.sameElements(c.sortBy(_._3).map(_._1)))
  }

  test("sequence_pack_shuffled: offsets are the cumsum in trainShuffle order; no Window; partitioning-invariant") {
    val docs = (0L until 120L).map(i =>
      (i, (1 to (1 + (i % 9)).toInt).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    val got = SequencePack.packShuffled(docs, budget = 16L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent recompute in the salted-FNV order
    var off = 0L
    val expected = (0L until 120L)
      .map(i => (i, 1L + (i % 9)))
      .sortBy { case (id, _) => (TextHash.fnv64(s"shuf:$id") & Long.MaxValue, id) }
      .map { case (id, nw) =>
        val start = off
        off += nw + 1
        id -> ((nw, start, start / 16, (start + nw) / 16))
      }.toMap
    assert(got == expected)
    // same output under forced skewed input partitioning
    val got2 = SequencePack.packShuffled(docs.repartition(13), budget = 16L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got2 == got)
    val plan = SequencePack.packShuffled(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"shuffled cumsum must not plan as a Window:\n$plan")
  }

  // ---- Dedup.crossCorpusNew ----

  test("cross-corpus dedup: exact copies flagged old, edits and additions new; text stays off the shuffle") {
    import graft.textops.Dedup
    val base = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "same same")).toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "alpha beta"),   // unchanged recrawl -> old
      (12L, "gamma delta!"), // edited -> new
      (13L, "brand new doc"),// addition -> new
      (14L, "same same")     // dup of base 3 -> old
    ).toDF("doc_id", "text")
    val df = Dedup.crossCorpusNew(incoming, base)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(11L -> 0L, 12L -> 1L, 13L -> 1L, 14L -> 0L))
    // the join moves 12-byte keys, never the text: no string attribute may
    // cross a hash shuffle (the textGroups contract)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val big = SparkEntry.queries("cross_corpus_dedup")(spark, sf)
    big.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => Nil
      }
      (p +: p.children.flatMap(walk)) ++ nested
    }
    // restrict to HASH shuffles: tp()'s round-robin input repartition
    // (the CLAUDE.md single-file-split salt) legitimately carries text
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    for (sh <- walk(big.queryExecution.executedPlan).collect {
           case s: ShuffleExchangeExec if s.outputPartitioning.isInstanceOf[HashPartitioning] => s
         }; a <- sh.output)
      assert(a.dataType != StringType,
        s"string attribute $a crosses a hash shuffle - text must reduce to (xxhash64, length) first")
  }

  // ---- HostRank.reciprocalLinks ----

  test("reciprocal links: truth table — both directions required, weights kept") {
    val edges = Seq(
      ("a", "b", 3L), ("b", "a", 1L),   // reciprocal pair
      ("a", "c", 2L),                   // one-way: excluded
      ("c", "b", 5L), ("b", "c", 4L),   // reciprocal pair
      ("d", "d", 9L)                    // self loop: never a pair
    ).toDF("src", "dst", "weight")
    val got = HostRank.reciprocalLinks(edges).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("a", "b") -> ((3L, 1L, 1L)),
      ("b", "c") -> ((4L, 5L, 4L))))
    // equi-join on the pair key, never a host product
    val plan = HostRank.reciprocalLinks(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
