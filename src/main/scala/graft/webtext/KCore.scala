package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition of the host graph — the density-based community
  * filter next to [[Triangles]] (closure) and [[HostRank]] (endorsement):
  * the k-core is the maximal subgraph where every host keeps ≥ k neighbors
  * AFTER all weaker hosts are discarded, the classic "is this host embedded
  * in a real neighborhood or just touched by one" cut (Seidman 1983). Link
  * farms and one-shot spam hosts peel out in the first rounds; genuinely
  * interlinked communities survive arbitrarily deep peeling.
  *
  * Algorithm: iterative peeling to a fixed point — per round, drop every
  * host whose degree in the CURRENT induced subgraph is < k, then drop the
  * edges that lost an endpoint; stop when a round removes nothing. The
  * fixed point is exactly the k-core (standard invariant: peeling order
  * never changes the result), which is what makes an UNROLLED-round SQL
  * oracle exact: rounds past convergence are no-ops, so a fixed oracle
  * depth ≥ the data's peel depth reproduces the engine's data-dependent
  * loop bit-for-bit (the rankConverged pattern).
  *
  * Scale shape: each round is two left-semi joins of the edge set against
  * the surviving host list plus one host-grain count — edge-grain shuffles
  * keyed on endpoints, nothing all-pairs. Rounds are data-dependent but
  * bounded by the graph's degeneracy ordering depth (tiny for web host
  * graphs; `maxRounds` guards pathological chains). Per-round EAGER
  * `localCheckpoint` truncates the iteration lineage (the Redirects /
  * rankConverged rule) and the per-round driver witness is a single
  * edge-count aggregate, never row data. */
object KCore {

  /** (host, in_core, core_deg) for every host of the input graph: in_core
    * = 1 iff the host survives k-core peeling, core_deg = its degree inside
    * the final core (0 outside). Directed duplicate edges collapse to one
    * undirected edge; weights are ignored (topology-only). */
  def kcoreHosts(edges: DataFrame, k: Int = 3, maxRounds: Int = 50): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    val hosts0 = und.select(col("a").as("host"))
      .unionByName(und.select(col("b").as("host")))
      .distinct().localCheckpoint(true)

    var cur = und
    var edgeCount = cur.count()
    var converged = edgeCount == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val alive = cur.select(col("a").as("host"))
        .unionByName(cur.select(col("b").as("host")))
        .groupBy("host").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("host")
      val next = cur
        .join(alive.select(col("host").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("host").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      val m = next.count()
      // next ⊆ cur by construction, so equal counts ⇒ equal sets ⇒ the
      // next round's alive set is identical: fixed point.
      converged = m == edgeCount
      edgeCount = m
      cur = next
    }

    val coreDeg = cur.select(col("a").as("host"))
      .unionByName(cur.select(col("b").as("host")))
      .groupBy("host").agg(count(lit(1)).as("core_deg"))
    hosts0.join(coreDeg, Seq("host"), "left")
      .select(col("host"),
        when(col("core_deg").isNotNull, 1L).otherwise(0L).as("in_core"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
  }
}
