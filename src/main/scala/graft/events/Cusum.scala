package graft.events

import graft.TimeCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM burst detection over event streams — the change-point primitive a
  * crawl scheduler runs per host (fetch-rate spikes → crawler traps, DDoS
  * reflections, breaking-news hosts) and an ops pipeline runs per event
  * type. One-sided CUSUM (Page 1954): S_t = max(0, S_{t−1} + n_t − thr)
  * over DENSE time buckets (empty hours count 0 and DRAIN the statistic —
  * skipping them would freeze alarms across quiet gaps), alarm while
  * S_t ≥ limit.
  *
  * The recurrence looks inherently sequential, but has the closed form
  * S_t = P_t − min(0, min_{s≤t} P_s) with P the prefix sum of (n_t − thr)
  * — so the whole scan is two window functions (running sum + running min)
  * partitioned by the series key: every key's timeline computes
  * independently, in parallel, with no driver loop and no UDF. That closed
  * form is also what makes the SQL oracle bit-exact.
  *
  * Integer contract (oracle-mirrored): bucket = ntz-epoch-seconds div 3600
  * ([[TimeCols]] — TZ-free, the r1 lesson); thr = ceil(per-key mean events
  * per bucket) + 1 = (total + H − 1) div H + 1 over H = span buckets
  * (scale-adaptive, so the same query is non-degenerate at any sf);
  * limit = thr + 2. No alarm reset: S decays at thr − n per quiet bucket,
  * the classic one-sided chart.
  *
  * Scale shape: the ONLY corpus-scale stage is the (key, bucket) count
  * (map-side partial agg). The dense series explode and both windows run
  * at key grain, bounded by the time span, partitioned by key — no global
  * window, no single-partition stage. */
object Cusum {

  /** Deterministic burst plant: every 5th event re-emitted into one of
    * three fixed wall-clock hours (2024-01-15 12:00 + id%3 h) — the spike
    * the detector must flag, at any sf. NTZ literal + field arithmetic
    * keeps it session-TZ-invariant. */
  def plantBurst(events: DataFrame): DataFrame = {
    val base = events.select(col("event_id"), col("event_type"), col("ts"))
    base.unionByName(events
      .where(col("event_id") % 5 === 0)
      .select((col("event_id") + 10000000L).as("event_id"), col("event_type"),
        expr("timestamp_ntz'2024-01-15 12:00:00' + make_interval(0,0,0,0, CAST(event_id%3 AS INT),0,0)").as("ts")))
  }

  /** (event_type, bucket, n, thr, s, burst) for every hour bucket in each
    * type's observed span. */
  def hourlyBursts(events: DataFrame): DataFrame = {
    val ep = events
      .select(col("event_type"), TimeCols.ntzEpochSeconds(col("ts")).as("sec"))
      .select(col("event_type"), expr("sec div 3600").as("b"))
    val cnt = ep.groupBy("event_type", "b").agg(count(lit(1)).as("n"))
    val th = ep.groupBy("event_type")
      .agg(min("b").as("lo"), max("b").as("hi"), count(lit(1)).as("total"))
      .withColumn("thr", expr("(total + (hi - lo + 1) - 1) div (hi - lo + 1) + 1"))
    val dense = th.select(col("event_type"), col("thr"),
      explode(sequence(col("lo"), col("hi"))).as("b"))
    val d = dense.join(cnt, Seq("event_type", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("b")
    d.withColumn("pf", sum(col("n") - col("thr")).over(w))
      .withColumn("mn", least(lit(0L), min("pf").over(w)))
      .select(col("event_type"), col("b").as("bucket"), col("n"), col("thr"),
        (col("pf") - col("mn")).as("s"))
      .withColumn("burst",
        when(col("s") >= col("thr") + 2, 1L).otherwise(0L))
  }
}
