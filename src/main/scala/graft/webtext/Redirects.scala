package graft.webtext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Redirect-chain resolution by pointer doubling — the crawl-frontier step
  * that collapses `301/302` chains onto their landing url before any dedup
  * or canonicalization (Common-Crawl index rows carry redirect targets; a
  * frontier that doesn't resolve them fetches the same landing page once per
  * chain alias and fragments every per-url statistic).
  *
  * Algorithm: functional-graph pointer jumping. `f₀(u) = next(u)`; each
  * round substitutes `f_{k+1}(u) = f_k(f_k(u))`, doubling the resolved
  * distance, so `ceil(log2(maxHops))` node-grain self-joins resolve every
  * chain up to `maxHops` — a length-10^6 chain needs 20 rounds, not 10^6
  * (the sequential-walk formulation a single-node resolver uses is the
  * scale-killer here). Termination state rides the pointer: `done` means
  * "my pointer is a landing url", seeded by an anti-join of targets against
  * sources and propagated through each doubling. Nodes still undone after
  * the rounds are in (or feed) a redirect loop, or exceed `maxHops` —
  * crawlers treat both identically ("too many redirects"), and so does the
  * `status` column ('cycle').
  *
  * Scale shape: state is node-grain (url, ptr, hops, done) — ~3 urls + 9
  * bytes per node; each round is one equi-join of that table with itself on
  * `ptr = node` (hash-partitioned, AQE-splittable) and `localCheckpoint`
  * truncates the doubling lineage exactly like the CC propagation loop.
  * Redirect nodes are a small fraction of the frontier on real crawls, and
  * only they iterate: done rows pass through each round untouched.
  */
object Redirects {

  def urlOf(id: Column): Column =
    concat(lit("https://site"), id % 7, lit(".example.com/r/"), id)

  /** Doc-grain frontier urls (FIXTURES family). */
  def plantUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), urlOf(col("doc_id")).as("url"))

  /** Deterministic redirect edges: chain classes `doc_id%7 ∈ 1..4` redirect
    * one step down (`url(i) → url(i-1)`, so class c sits c hops from the
    * class-0 landing url), plus a planted 2-cycle `url(i) ↔ url(i+1)` for
    * every `doc_id%77 == 5`. */
  def plantRedirects(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val chains = docs.filter(id % 7 >= 1 && id % 7 <= 4)
      .select(urlOf(id).as("src"), urlOf(id - 1).as("dst"))
    val cycleA = docs.filter(id % 77 === 5)
      .select(urlOf(id).as("src"), urlOf(id + 1).as("dst"))
    val cycleB = docs.filter(id % 77 === 5)
      .select(urlOf(id + 1).as("src"), urlOf(id).as("dst"))
    chains.unionByName(cycleA).unionByName(cycleB)
  }

  /** Resolve every frontier url through `redirects(src, dst)`:
    * `(doc_id, url, status, hops, final_url)` with status 'ok' (landed
    * within maxHops; final_url + hop count) or 'cycle' (loop or > maxHops;
    * final_url null, hops -1). */
  def resolve(urls: DataFrame, redirects: DataFrame, maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1)
    val nodes = redirects.select(col("src").as("node"))
      .unionByName(redirects.select(col("dst").as("node")))
      .unionByName(urls.select(col("url").as("node")))
      .distinct()
    // seed: terminal = no outgoing edge; a redirect is done iff its target
    // is terminal (anti-join of dst against the src set)
    val srcs = redirects.select(col("src")).distinct()
    val edges = redirects
      .join(srcs.withColumnRenamed("src", "s2"), col("dst") === col("s2"), "left")
      .select(col("src").as("node"), col("dst").as("ptr"),
        lit(1L).as("hops"), col("s2").isNull.as("done"))
    var f = nodes.join(edges, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("ptr"), col("node")).as("ptr"),
        coalesce(col("hops"), lit(0L)).as("hops"),
        coalesce(col("done"), lit(true)).as("done"))
    val rounds = math.max(1, 32 - Integer.numberOfLeadingZeros(maxHops - 1)) // ceil(log2)
    for (r <- 1 to rounds) {
      val g = f.select(col("node").as("g_node"), col("ptr").as("g_ptr"),
        col("hops").as("g_hops"), col("done").as("g_done"))
      f = f.join(g, col("ptr") === col("g_node"), "left")
        .select(col("node"),
          when(col("done"), col("ptr")).otherwise(coalesce(col("g_ptr"), col("ptr"))).as("ptr"),
          when(col("done"), col("hops"))
            .otherwise(least(col("hops") + coalesce(col("g_hops"), lit(0L)), lit(maxHops + 1L))).as("hops"),
          (col("done") || coalesce(col("g_done"), lit(false))).as("done"))
      // Lineage control, measured (BENCH.md): EAGER localCheckpoint per round
      // cost 14 s warm at sf0.1 — each round forced a full driver job cascade
      // before any result was needed. A lazy segment checkpoint every 3rd
      // round keeps the self-join plan tree bounded at depth 2^3 per segment
      // (a 20-round/10^6-hop resolve stays polynomial) while the common
      // maxHops=8 (3 rounds) runs as ONE AQE job with ReusedExchange dedup —
      // 3.4-5 s warm, same rows. Per-round materialization is pure overhead
      // when the round count is already logarithmic.
      if (r % 3 == 0 && r < rounds) f = f.localCheckpoint(false)
    }
    urls.join(f, col("url") === col("node"), "left")
      .select(col("doc_id"), col("url"),
        when(col("done") && col("hops") <= maxHops, lit("ok")).otherwise(lit("cycle")).as("status"),
        when(col("done") && col("hops") <= maxHops, col("hops")).otherwise(lit(-1L)).as("hops"),
        when(col("done") && col("hops") <= maxHops, col("ptr"))
          .otherwise(lit(null).cast("string")).as("final_url"))
  }
}
