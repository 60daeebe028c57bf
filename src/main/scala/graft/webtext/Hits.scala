package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities over the (src, dst, weight) host link graph —
  * the companion quality prior to [[HostRank]]'s PageRank: PageRank scores
  * global endorsement, HITS separates "pages that point at good content"
  * (hubs: directories, link lists, spam farms score high here and low on
  * authority) from "content many good hubs point at" (authorities). Crawl
  * curation uses the PAIR: high-hub/low-auth hosts are link farms to
  * down-weight, high-auth hosts are fetch-first sources. The reference has
  * no graph op; this extends the web-scale tier (Kleinberg, JACM 46(5),
  * 1999 — re-expressed as integer fixed-point relational algebra).
  *
  * Arithmetic contract (mirrored verbatim by the DuckDB oracle, the
  * host_rank pattern):
  *   - hub₀ = `scale` (10^6) for every node;
  *   - auth half-round: araw_k(v) = Σ_{e:(u,v)} hub_{k-1}(u)·w(e), then
  *     renormalize by the MAX (the float 2-norm is replaced by an integer
  *     max-norm — same fixed-point ranking, one trunc division):
  *     auth_k = (araw_k · scale) div max(araw_k), absent in-edges → 0;
  *   - hub half-round symmetrically from auth_k over out-edges.
  *   All values non-negative; every division is a single trunc `div` whose
  *   divisor is a 1-row aggregate. Overflow bound: araw ≤ scale · Σw — at
  *   scale 10^6 the product stays in long while total edge weight < 9·10^12;
  *   lift to DECIMAL(38,0) (same trunc semantics) beyond that.
  *
  * Scale shape: the edge table is loop-invariant and cached once; each
  * half-round is one edges ⋈ scores join ON the edge grain (shuffle ∝ |e|),
  * a dst- (or src-) grain partial-then-final agg, a 1-row max broadcast by
  * crossJoin, and a node-grain left join — no node-table broadcast assumed,
  * so the plan holds at 10^7 hosts. Lineage is truncated with a lazy
  * localCheckpoint every round (the Redirects/HostRank pattern, tightened
  * because the two interleaved chains nest twice per round) so long runs
  * plan in constant depth.
  */
object Hits {

  /** Run `iters` full HITS rounds. Returns (host, hub, auth) in `scale`
    * max-normalized fixed-point units. */
  def hubsAuths(edges: DataFrame, iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val nodes = edges.select(col("src").as("host"))
      .unionByName(edges.select(col("dst").as("host")))
      .distinct().cache()
    val e = edges.select("src", "dst", "weight").cache()

    def half(scores: DataFrame, scoreCol: String, joinSide: String,
             outSide: String, outCol: String): DataFrame = {
      val raw = e
        .join(scores.withColumnRenamed("host", joinSide), joinSide)
        .groupBy(col(outSide).as("host"))
        .agg(sum(col(scoreCol) * col("weight")).as("raw"))
      val mx = raw.agg(max("raw").as("mx"))
      nodes.join(raw, Seq("host"), "left")
        .crossJoin(broadcast(mx))
        .select(col("host"),
          coalesce(expr(s"(raw * ${scale}L) div mx"), lit(0L)).as(outCol))
    }

    var hub = nodes.withColumn("hub", lit(scale))
    var auth = nodes.withColumn("auth", lit(0L))
    for (k <- 1 to iters) {
      auth = half(hub, "hub", "src", "dst", "auth")
      hub = half(auth, "auth", "dst", "src", "hub")
      // Unlike HostRank's single chain, the hub plan EMBEDS the auth plan
      // (two half-rounds nest per round), so lineage doubles per half-round
      // — truncate BOTH chains every round, not every 3 (lazy, node-grain
      // RDDs, so each truncation is one tiny job at materialization time).
      if (k < iters) {
        auth = auth.localCheckpoint(false)
        hub = hub.localCheckpoint(false)
      }
    }
    hub.join(auth, "host").select("host", "hub", "auth")
  }
}
