package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-citation host similarity — two hosts are related when the same pages
  * link to BOTH (Small 1973; the Dean–Henzinger related-pages signal): it
  * finds topical siblings and mirror families that content similarity
  * misses, because the evidence lives in the citing side of the graph. The
  * score is the exact Jaccard of the two hosts' citing sets, in basis
  * points with one trunc division (integer contract, oracle-mirrored):
  * jac_bp = (|C₁∩C₂| · 10000) div (|C₁| + |C₂| − |C₁∩C₂|).
  *
  * Scale shape: the pair generator is a self-join of the distinct edge set
  * on the CITING host — wedge cost is Σ out-deg², bounded by the frontier's
  * per-host fetch policy, not by popular targets (a million-in-link hub
  * never pairs with anything through its own popularity; only prolific
  * CITERS fan out, and [[HostCap]]-style out-degree capping upstream is the
  * standard guard). Intersection counts come from the pair-grain hash
  * aggregate; the two |C| lookups are host-grain joins. No cartesian. */
object Cocite {

  /** (h1, h2, cocite, jac_bp) for every unordered host pair with at least
    * one shared citer, h1 < h2; self-loops dropped, duplicate directed
    * edges collapsed (set semantics — a citer counts once). */
  def cocitationPairs(edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst")
      .where(col("src") =!= col("dst"))
      .distinct().cache()
    val indeg = e.groupBy("dst").agg(count(lit(1)).as("indeg"))
    val pairs = e.select(col("src"), col("dst").as("h1"))
      .join(e.select(col("src"), col("dst").as("h2")), Seq("src"))
      .where(col("h1") < col("h2"))
      .groupBy("h1", "h2").agg(count(lit(1)).as("cocite"))
    pairs
      .join(indeg.select(col("dst").as("h1"), col("indeg").as("i1")), Seq("h1"))
      .join(indeg.select(col("dst").as("h2"), col("indeg").as("i2")), Seq("h2"))
      .select(col("h1"), col("h2"), col("cocite"),
        expr("(cocite * 10000L) div (i1 + i2 - cocite)").as("jac_bp"))
  }
}
