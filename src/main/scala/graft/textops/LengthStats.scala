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
}
