package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-based language mixture — the multilingual sampling stage
  * (mBERT / XLM-R style): sampling probability ∝ n_tokens^(1/τ) so
  * low-resource languages are up-weighted without drowning high-resource
  * ones. τ = 2 makes the exponent an integer square root, which keeps the
  * whole table exact integer arithmetic (ppm/bp trunc division, [[isqrt]]
  * exact by construction — no float `pow`, no float `sqrt`).
  *
  * Scale shape: ONE corpus aggregation at language grain (map-side partials;
  * ~10^2 languages of state), then everything runs on the lang-grain table
  * with 1-row totals broadcast — the same plan at 10^12 docs.
  *
  * Output: (lang, n_tokens, natural_ppm, temp_ppm, boost_bp) where boost_bp
  * is the rate change vs natural sampling in basis points. */
object LangMixture {

  /** Exact floor(sqrt(n)) on nonnegative Longs — Newton iteration seeded by
    * the float estimate, corrected to the exact floor (the float alone can
    * be off by one near perfect squares above 2^52). */
  def isqrt(n: Long): Long = {
    require(n >= 0, "isqrt of negative")
    if (n == 0) return 0L
    var x = math.max(1L, math.sqrt(n.toDouble).toLong)
    // overflow-safe: x*x <= n  <=>  x <= n div x (for positive x), so the
    // correction never multiplies two near-2^31 values
    while (x > n / x) x -= 1
    while (x + 1 <= n / (x + 1)) x += 1
    x
  }

  def temperatureMixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val byLang = docs
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ", -1)).cast("long")).as("n_tokens"))
      .as[(String, Long)]
      .map { case (lang, n) => (lang, n, isqrt(n)) }
      .toDF("lang", "n_tokens", "w")
    val totals = byLang.agg(sum("n_tokens").as("tt"), sum("w").as("swt"))
    byLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_tokens"),
        expr("n_tokens * 1000000 div tt").as("natural_ppm"),
        expr("w * 1000000 div swt").as("temp_ppm"),
        expr("(w * 1000000 div swt) * 10000 div (n_tokens * 1000000 div tt)").as("boost_bp"))
  }
}
