package graft.events

import graft.TimeCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval-containment) join — the operator Spark's
  * planner lacks: `a JOIN b ON pt BETWEEN lo AND hi` has no equi-key, so
  * Catalyst falls back to BroadcastNestedLoopJoin (quadratic work) the
  * moment neither side is tiny. The standard distributed fix is BUCKETING:
  * quantize the time axis into width-B buckets, explode each interval to
  * its covered bucket span (⌈len/B⌉+1 rows), tag each point with its single
  * bucket, equi-join on the bucket, and re-verify the exact BETWEEN inside
  * the match. A (interval, point) pair meets in EXACTLY one bucket — the
  * point's — so no dedup pass is needed; work is |points| + Σ span/B with
  * the bucket width trading explode volume against bucket occupancy.
  * Hot buckets (flash crowds) are plain AQE skew-join territory.
  *
  * The workload: incident windows (every 97th event opens a 90-minute
  * window) joined against 'error' events — the "which errors fall inside
  * which maintenance/incident window" ops query. Epochs via [[TimeCols]]
  * (TZ-free). */
object RangeJoin {

  val BucketSec = 1800L

  def incidentWindows(events: DataFrame): DataFrame =
    events.where(col("event_id") % 97 === 0)
      .select(col("event_id").as("iv_id"),
        TimeCols.ntzEpochSeconds(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + 5400L)

  def errorPoints(events: DataFrame): DataFrame =
    events.where(col("event_type") === "error")
      .select(col("event_id"), TimeCols.ntzEpochSeconds(col("ts")).as("sec"))

  /** (iv_id, event_id, sec): every point inside every interval, via the
    * bucketized equi-join (plan-pinned: no nested-loop, no cartesian). */
  def containJoin(intervals: DataFrame, points: DataFrame,
                  bucketSec: Long = BucketSec): DataFrame = {
    require(bucketSec > 0)
    val iv = intervals.select(col("iv_id"), col("lo"), col("hi"),
        explode(sequence(expr(s"lo div ${bucketSec}L"),
          expr(s"hi div ${bucketSec}L"))).as("bucket"))
    val pt = points.select(col("event_id"), col("sec"),
      expr(s"sec div ${bucketSec}L").as("bucket"))
    iv.join(pt, Seq("bucket"))
      .where(col("sec") >= col("lo") && col("sec") <= col("hi"))
      .select("iv_id", "event_id", "sec")
  }
}
