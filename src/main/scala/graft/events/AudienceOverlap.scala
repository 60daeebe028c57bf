package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.KmvSketchAgg.kmvSketch
import graft.webtext.SnapshotOverlap

/** Pairwise audience overlap between event types from per-type KMV sketches
  * — the segment-overlap matrix every product-analytics surface keeps
  * ("how many of the users who X also Y?"), at the (user, day) co-activity
  * grain shared with `hll_distinct`.
  *
  * Scale shape: the corpus is touched ONCE — one partial-aggregated
  * groupBy(event_type) building a k*8-byte sketch per type — and the t x t
  * pairwise matrix is then pure integer arithmetic over a t-row table
  * (broadcast self-join, t = |event types|). The naive exact matrix is t^2
  * corpus-grain self-joins; at 10^12 events that is the difference between
  * a dashboard tile and a cluster job. Exact counts ride along from one
  * (type, v)-distinct side table (the eval branch you delete at scale).
  */
object AudienceOverlap {

  /** events (event_type, v) -> one row per unordered type pair
    * (type_a < type_b) with the full estimate column set. */
  def overlapMatrix(events: DataFrame, k: Int = 256): DataFrame = {
    // r6: the sketch is built from the distinct (type, v) table, not a
    // second corpus pass — KMV state is the k smallest DISTINCT hashes (a
    // TreeSet), so duplicates never change it and the sketch is
    // bit-identical; dv's distinct exchange is now shared by the sketch,
    // exact and counts branches via ReuseExchange (one corpus scan total).
    val dv = events.select("event_type", "v").distinct()
    val sk = dv.groupBy("event_type").agg(kmvSketch(col("v"), k).as("s"))
    val exact = dv.as("x").join(dv.as("y"), col("x.v") === col("y.v"))
      .filter(col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val counts = dv.groupBy("event_type").agg(count(lit(1)).as("nd"))
    val pairs = sk.as("a").join(broadcast(sk.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .join(broadcast(exact), Seq("type_a", "type_b"))
      .join(broadcast(counts.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("nd", "nd_a")), Seq("type_a"))
      .join(broadcast(counts.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("nd", "nd_b")), Seq("type_b"))
      .withColumn("exact_union", expr("nd_a + nd_b - exact_inter"))
    SnapshotOverlap.estimates(pairs, k)
      .select(col("type_a"), col("type_b"), col("m"), col("matches"),
        col("jaccard_bp"), col("est_union"), col("est_inter"),
        col("exact_union"), col("exact_inter"), col("union_err_bp"))
      .orderBy("type_a", "type_b")
  }

  /** The (user, day) co-activity key — identical arithmetic to
    * `hll_distinct`'s grain so the splitmix oracle chain is shared. */
  def userDayKeys(events: DataFrame): DataFrame =
    events.select(col("event_type"), col("user_id"),
        graft.TimeCols.ntzEpochSeconds(col("ts")).as("es"))
      .select(col("event_type"), expr("user_id * 1024L + (es div 86400L)").as("v"))
}
