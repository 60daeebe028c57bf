package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph triangle counting + local clustering coefficients — the
  * community-structure signal next to [[HostRank]] (endorsement) and
  * [[Hits]] (hub/authority roles): hosts whose neighbors also link each
  * other sit inside genuine topical communities, while link farms show
  * star shapes (high degree, near-zero clustering) — a standard spam
  * discriminator. Computed with the degree-ordered orientation of
  * Suri–Vassilvitskii (WWW'11): orient every undirected edge from the
  * lower-(degree, host) endpoint to the higher, enumerate wedges only at
  * each node's ORIENTED out-neighbors, and close them against the oriented
  * edge set — each triangle materializes exactly once, and wedge count is
  * bounded by Σ out-deg² where orientation caps out-degree at O(√m), not
  * by the Σ deg² a hub would explode.
  *
  * Integer contract (oracle-mirrored): deg = distinct undirected neighbor
  * count; tri = triangles incident to the host; cc_bp =
  * (tri · 20000) div (deg · (deg − 1)) — 2·tri / (deg choose 2) in basis
  * points, 0 when deg < 2. Everything is counts and one trunc division.
  *
  * Scale shape: undirected canonicalization is an edge-grain distinct; the
  * orientation join attaches two degree lookups (host-grain table, NOT
  * broadcast-assumed); wedges and closures are equi-joins keyed on the
  * shared endpoint / the (lo, hi) pair — no cartesian anywhere; per-host
  * rollup is an explode of 3 rows per triangle. */
object Triangles {

  /** (host, deg, tri, cc_bp) over the directed (src, dst, weight) edges,
    * weights ignored (topology-only, the standard clustering setup). */
  def hostTriangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct().cache()
    val deg = und.select(col("a").as("host"))
      .unionByName(und.select(col("b").as("host")))
      .groupBy("host").agg(count(lit(1)).as("deg"))
    // orient: (u -> v) iff (deg_u, u) < (deg_v, v) lexicographically
    val withDeg = und
      .join(deg.select(col("host").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("host").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .cache()
    // wedges at u: ordered out-neighbor pairs by the SAME (deg, host) order
    val x = oriented.select(col("u"), col("v").as("lo"), col("dv").as("dlo"))
    val y = oriented.select(col("u"), col("v").as("hi"), col("dv").as("dhi"))
    val wedges = x.join(y, "u")
      .where(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")))
      .select("u", "lo", "hi")
    val closures = oriented.select(col("u").as("lo"), col("v").as("hi"))
    val tris = wedges.join(closures, Seq("lo", "hi"), "left_semi")
    val perHost = tris
      .select(explode(array(col("u"), col("lo"), col("hi"))).as("host"))
      .groupBy("host").agg(count(lit(1)).as("tri"))
    deg.join(perHost, Seq("host"), "left")
      .select(col("host"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_bp",
        when(col("deg") < 2, 0L)
          .otherwise(expr("(tri * 20000L) div (deg * (deg - 1L))")))
  }
}
