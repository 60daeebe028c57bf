package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus length-distribution quantiles from a log2 histogram — the
  * length-percentile report every curation run consults (truncation
  * thresholds, Gopher bounds, token-budget planning) computed the way it
  * must be at 10^12 docs: a FIXED 64-bin histogram with map-side partial
  * counts, not a global sort. `approx_percentile` would do this with a
  * float GK sketch; the log2-bin formulation is integer-exact end to end
  * (bin = floor(log2(len)) via binary-string length, quantile = lower bound
  * 2^bin of the first bin whose cumulative count clears `q% * N`), so the
  * SQL oracle recomputes it bit-for-bit. Resolution is the power-of-two
  * bracket — exactly what threshold tuning consumes.
  *
  * Scale shape: one narrow map-side projection to an 8-byte bin, a 64-row
  * aggregate, and a 64-row window — nothing downstream of the scan exceeds
  * 64 rows, so the "global" window is a non-issue.
  */
object LengthStats {

  /** One row: (n_docs, p50_lo, p90_lo, p99_lo) over `n_chars`. */
  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val bins = docs
      .select(expr("cast(length(conv(n_chars, 10, 2)) - 1 as bigint)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val total = bins.agg(sum("n").as("total"))
    val cum = bins.withColumn("cumn",
      sum("n").over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def qLo(q: Int) =
      min(when(col("cumn") * 100 >= lit(q.toLong) * col("total"),
        expr("shiftleft(1L, cast(bin as int))"))).as(s"p${q}_lo")
    cum.crossJoin(broadcast(total))
      .agg(max("total").as("n_docs"), qLo(50), qLo(90), qLo(99))
  }

  /** EXACT corpus quantiles — the companion to [[lengthQuantiles]] when the
    * measured variable has a BOUNDED VALUE DOMAIN (char length, token count,
    * line count: domains of ≤ ~10^6 distinct values no matter how many
    * documents). The classic "exact quantiles need a global sort" objection
    * does not apply to bounded domains: aggregate to value grain (map-side
    * partials — the ONLY corpus-scale stage), then every later step runs on
    * ≤ |domain| rows, where a cumulative window and a non-equi broadcast
    * join are free. Quantile contract, integer-exact and oracle-mirrored:
    * q (basis points) selects the SMALLEST value whose cumulative count
    * reaches rank = ceil(q·N / 10000) = (q·N + 9999) div 10000 — the
    * classic type-1 (inverse-CDF) definition. */
  def exactQuantiles(docs: DataFrame,
                     qsBp: Seq[Long] = Seq(2500L, 5000L, 7500L, 9000L, 9900L)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vals = docs.select(length(col("text")).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
    val total = vals.agg(sum("n").as("total"))
    // value-grain cumulative: the single-partition window is over the
    // bounded domain (≤ distinct lengths), never the corpus
    val cum = vals.withColumn("cumn",
      sum("n").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranks = qsBp.toDF("q_bp").crossJoin(broadcast(total))
      .withColumn("rnk", expr("(q_bp * total + 9999L) div 10000L"))
      .select("q_bp", "rnk")
    ranks.join(broadcast(cum), col("cumn") >= col("rnk"))
      .groupBy("q_bp", "rnk").agg(min("v").as("value"))
      .select("q_bp", "rnk", "value")
  }
}
