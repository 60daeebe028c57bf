package graft.webtext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.KmvSketchAgg.kmvSketch

/** Crawl-snapshot set overlap from KMV sketches — union size, intersection
  * size, and Jaccard ESTIMATED from two k*8-byte sketches instead of a
  * corpus-grain join: the monitoring twin of [[Recrawl.delta]] (which
  * compares every row exactly). At 10^12 pages per snapshot the delta join
  * shuffles both corpora; the sketch answer ships one bounded aggregate per
  * snapshot and compares them with pure integer arithmetic, so a crawl
  * dashboard can track churn per (snapshot, snapshot) pair for free.
  *
  * Estimator (Beyer et al. / theta-sketch form, all trunc-integer):
  * M = bottom-k of the two sketches' union (set semantics; this IS the KMV
  * sketch of A∪B because each sketch retains every hash below its own
  * threshold); m = |M|; matches = |M ∩ sa ∩ sb|;
  * est_union = m if m < k (sketch saw the whole union — exact), else
  * (k-1)*2^64 div u_k with u_k = the k-th (largest) value in M, unsigned;
  * jaccard_bp = matches*10000 div m; est_inter = matches*est_union div m.
  * Exact counts ride along as eval ground truth (the hll_distinct/ann
  * 'hit'-flag pattern) — at production scale the exact branch is the thing
  * you delete.
  *
  * Arithmetic is unsigned-exact on both engines: Spark compares hashes via
  * the sign-bit-flip bias (`h ^ Long.MinValue` preserves unsigned order in
  * signed comparisons) and widens u_k to DECIMAL(38,0) for the single
  * 2^64-scaled division (`div` = trunc IntegralDivide -> BIGINT); the DuckDB
  * oracle carries hashes as HUGEINT in [0, 2^64) natively and `//`-divides.
  */
object SnapshotOverlap {

  private val Two64 = "CAST(18446744073709551616 AS DECIMAL(38,0))"
  private def unsignedDec(c: String) =
    s"CASE WHEN $c < 0 THEN CAST($c AS DECIMAL(38,0)) + $Two64 ELSE CAST($c AS DECIMAL(38,0)) END"

  /** Overlap estimates between key sets `a` and `b` (single LONG column
    * `v` each). One row: (k, m, matches, jaccard_bp, est_union, est_inter,
    * exact_union, exact_inter, union_err_bp). */
  def overlap(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val sa = a.agg(kmvSketch(col("v"), k).as("sa"))
    val sb = b.agg(kmvSketch(col("v"), k).as("sb"))
    val exact = a.select("v").unionByName(b.select("v")).distinct()
      .join(a.select("v").intersect(b.select("v"))
              .agg(count(lit(1)).as("exact_inter")).hint("broadcast"))
      .agg(count(lit(1)).as("exact_union"), first("exact_inter").as("exact_inter"))
    // all three inputs are 1-row aggregates: broadcast cross joins, no shuffle
    estimates(sa.join(sb.hint("broadcast")).join(exact.hint("broadcast")), k)
      .select(lit(k.toLong).as("k"), col("m"), col("matches"), col("jaccard_bp"),
        col("est_union"), col("est_inter"), col("exact_union"), col("exact_inter"),
        col("union_err_bp"))
  }

  /** The shared sketch-pair arithmetic: given rows carrying two KMV sketch
    * arrays `sa`/`sb` (any grain — one snapshot pair, a pairwise matrix of
    * event types or shards) plus ground-truth `exact_union`/`exact_inter`
    * columns, append m, matches, jaccard_bp, est_union, est_inter,
    * union_err_bp. Pure codegen column arithmetic — no UDF, no shuffle. */
  private[graft] def estimates(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("mfull",
        expr("""array_sort(array_union(sa, sb),
               |  (x, y) -> CASE
               |    WHEN (x ^ -9223372036854775808) < (y ^ -9223372036854775808) THEN -1
               |    WHEN (x ^ -9223372036854775808) > (y ^ -9223372036854775808) THEN 1
               |    ELSE 0 END)""".stripMargin))
      .withColumn("m", least(size(col("mfull")).cast("long"), lit(k.toLong)))
      .withColumn("mk", expr(s"slice(mfull, 1, ${k})"))
      .withColumn("matches",
        expr("size(array_intersect(array_intersect(mk, sa), sb))").cast("long"))
      .withColumn("uk", expr("element_at(mk, CAST(m AS INT))"))
      .withColumn("est_union",
        when(col("m") < k.toLong, col("m")).otherwise(
          expr(s"(CAST(${k - 1} AS DECIMAL(38,0)) * $Two64) div ${unsignedDec("uk")}")))
      .withColumn("jaccard_bp", expr("matches * 10000L div m"))
      .withColumn("est_inter", expr("matches * est_union div m"))
      .withColumn("union_err_bp",
        expr("abs(est_union - exact_union) * 10000L div exact_union"))

  /** Distinct-count estimate from ONE KMV sketch column (named `sketchCol`):
    * |S| when |S| < k (the sketch saw everything — exact), else
    * (k-1)*2^64 div u_k — same trunc-integer arithmetic as the pair path. */
  def distinctEstimate(sketchCol: String, k: Int): org.apache.spark.sql.Column = {
    val uk = s"element_at($sketchCol, size($sketchCol))"
    when(size(col(sketchCol)) < k, size(col(sketchCol)).cast("long"))
      .otherwise(expr(s"(CAST(${k - 1} AS DECIMAL(38,0)) * $Two64) div ${unsignedDec(uk)}"))
  }

  /** Page-STATE keys (url x content version) for the two snapshots of the
    * planted recrawl fixture, as SQL-derivable longs: A = doc_id*2;
    * B mirrors [[Recrawl.snapshotB]]'s rules — recrawled docs keep their key
    * unless modified (doc_id%5==1 flips the low bit), doc_id%7==3 drop out,
    * doc_id%11==0 add a fresh page at (doc_id+1000000)*2. Production keying
    * is xxhash64 of the url/content pair; the fixture keys are arithmetic so
    * the DuckDB oracle can derive the identical key stream (the same reason
    * every planted fixture in this repo is doc_id arithmetic). */
  def stateKeysA(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") * 2L).as("v"))

  def stateKeysB(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.filter(id % 7 =!= 3)
      .select((id * 2L + when(id % 5 === 1, 1L).otherwise(0L)).as("v"))
      .unionByName(docs.filter(id % 11 === 0).select(((id + 1000000L) * 2L).as("v")))
  }
}
