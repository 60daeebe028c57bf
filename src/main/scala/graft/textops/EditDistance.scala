package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-level edit-distance verification — the exact-check stage that
  * follows any candidate generator (MinHash/OPH/SimHash bands) when the dedup
  * policy is defined on CHARACTER affinity rather than shingle Jaccard
  * (news-article versioning, OCR re-runs, template micro-edits). Shingle
  * Jaccard is blind to in-word edits; Levenshtein is the ground truth the
  * candidates are audited against.
  *
  * Scale shape: cost is PAIR-grain, never corpus-grain — candidates arrive
  * id-keyed, texts join in via two narrow hash joins (each text crosses the
  * wire once per pair side), and the kernel is Ukkonen's banded DP:
  * verification only needs `dist <= k` (k = relative threshold x max length),
  * so the DP visits O((2k+1) * min(n,m)) cells instead of O(n*m) and
  * early-exits the row the band's minimum exceeds k — a 10x+ saving at the
  * 20% threshold, and the reason a verify pass over 10^9 candidate pairs is
  * affordable. Distances above the cap are reported AS the cap (k+1): the
  * verdict is unaffected and the oracle recomputes it exactly via
  * `least(levenshtein(a,b), k+1)`.
  */
object EditDistance {

  /** `min(levenshtein(a, b), k + 1)` in O((2k+1) * min(|a|,|b|)) time and
    * O(min(|a|,|b|)) space (Ukkonen's band + early exit). Exact for all
    * distances `<= k`; any larger distance returns exactly `k + 1`. */
  def boundedEdit(a: String, b: String, k: Int): Int = {
    if (k < 0) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (m - n > k) return k + 1
    if (n == 0) return m // m - n <= k here, so m <= k
    val inf = k + 1
    // dp(i)(j) = dist(t[0,i), s[0,j)); only |i - j| <= k is reachable under
    // the cap. Rolling rows with INF sentinels one past each band edge so the
    // next row (band shifted by one) reads INF outside the previous band.
    var prev = new Array[Int](n + 2)
    var cur = new Array[Int](n + 2)
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      val lo = if (i - k > 1) i - k else 1
      val hi = if (i + k < n) i + k else n
      cur(0) = if (i <= k) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var rowMin = cur(0)
      val tc = t.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (tc == s.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1 // from t: dp(i-1, j) + 1
        val ins = cur(j - 1) + 1 // from s: dp(i, j-1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi + 1 <= n + 1) cur(hi + 1) = inf
      if (rowMin > k) return inf // no cell can decrease along a DP path
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(n) < inf) prev(n) else inf
  }

  /** Plant character-level near-duplicate twins: doc_id + [[Dedup.PlantOffset]]
    * with every 16th word (0-based index `i % 16 == 3`) substituted by
    * `"e" + i` — sparse in-word edits that shingle dedup under-counts but
    * Levenshtein measures exactly. Pure word-slice arithmetic so DuckDB
    * regrows the twin with an indexed list comprehension. */
  def plantEdits(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val twin = docs.select(
      (col("doc_id") + Dedup.PlantOffset).as("doc_id"),
      array_join(transform(ws, (w, i) =>
        when(i % 16 === 3, concat(lit("e"), i.cast("string"))).otherwise(w)), " ")
        .as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(twin)
  }

  /** Verify candidate pairs against the 20% relative edit-distance policy
    * over the [[plantEdits]] corpus. Candidates: each doc paired with its own
    * twin (true near-dup) and its successor's twin (decoy — unrelated text,
    * 60-80% distance on this corpus); both are doc_id arithmetic so the
    * oracle regrows the exact pair set. Output per pair: the (capped)
    * distance, the length bound, and the `is_dup` verdict
    * `5 * dist <= max_len` — all exact integers. */
  def verifyPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val corpus = plantEdits(docs)
    val ids = docs.select(col("doc_id"))
    val cand = ids.select(col("doc_id").as("a"), (col("doc_id") + Dedup.PlantOffset).as("b"))
      .unionByName(ids.select(col("doc_id").as("a"),
        (col("doc_id") + Dedup.PlantOffset + 1).as("b")))
    // inner joins drop the one decoy whose successor twin doesn't exist
    // (max doc_id) — the oracle's joins drop it identically
    val joined = cand
      .join(corpus.select(col("doc_id").as("a"), col("text").as("ta")), "a")
      .join(corpus.select(col("doc_id").as("b"), col("text").as("tb")), "b")
      .select(col("a"), col("b"), col("ta"), col("tb"))
    joined.as[(Long, Long, String, String)]
      .mapPartitions(_.map { case (a, b, ta0, tb0) =>
        val ta = if (ta0 == null) "" else ta0
        val tb = if (tb0 == null) "" else tb0
        val maxLen = math.max(ta.length, tb.length).toLong
        val cap = (maxLen / 5L).toInt // is_dup needs dist <= floor(maxLen/5)
        val d = boundedEdit(ta, tb, cap).toLong
        (a, b, d, maxLen, 5L * d <= maxLen)
      })
      .toDF("a", "b", "edit_dist", "max_len", "is_dup")
  }
}
