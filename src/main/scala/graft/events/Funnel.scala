package graft.events

import graft.TimeCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnels (view → click → purchase) — the event-
  * analytics primitive behind crawl-session analysis and product funnels
  * alike: how far does each user get through an ORDERED step sequence,
  * where each step must happen after the previous one AND within a time
  * window of it. Semantics (oracle-mirrored):
  *
  *   - step 1: the user's first 'view';
  *   - step 2: the first 'click' that follows ANY view with
  *     click_sec − view_sec ≤ window (a click can convert any earlier
  *     impression, the standard any-touch attribution);
  *   - step 3: the first 'purchase' after THAT click within the window.
  *
  * Event order is the composite key k = sec·10^7 + event_id — sec from
  * [[TimeCols.ntzEpochSeconds]] (TZ-free), event_id the within-second
  * tiebreak. Contract: event ids < 10^7 (holds for the test tables; a
  * wider id space just needs a wider radix on both engine and oracle).
  *
  * Scale shape: everything is user-grain — three filtered projections, one
  * (click × view) join bounded per user by per-user activity (heavy users
  * are capped upstream in a real pipeline, the HostCap story), and
  * user-grain min aggregates. No window over the corpus, no driver state. */
object Funnel {

  def funnel(events: DataFrame, windowSec: Long = 14400L): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        TimeCols.ntzEpochSeconds(col("ts")).as("sec"))
      .select(col("user_id"), col("event_type"), col("sec"),
        (col("sec") * 10000000L + col("event_id")).as("k"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("k").as("vk"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("k").as("vk2"), col("sec").as("vs"))
    val cand = ev.where(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .where(col("vk2") < col("k") && col("sec") - col("vs") <= windowSec)
      .groupBy("user_id").agg(min("k").as("ck"))
    val p = ev.where(col("event_type") === "purchase")
      .join(cand, Seq("user_id"))
      .where(col("k") > col("ck") &&
        col("sec") - expr("ck div 10000000") <= windowSec)
      .groupBy("user_id").agg(min("k").as("pk"))
    v.join(cand, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + col("ck").isNotNull.cast("long") + col("pk").isNotNull.cast("long"))
          .as("reached"),
        expr("vk div 10000000").as("view_sec"),
        coalesce(expr("ck div 10000000"), lit(-1L)).as("click_sec"),
        coalesce(expr("pk div 10000000"), lit(-1L)).as("purchase_sec"))
  }
}
