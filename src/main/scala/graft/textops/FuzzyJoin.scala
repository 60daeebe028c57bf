package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked record linkage — matching two catalogs on NOISY keys (recrawled
  * titles, product names, citation strings) where equality fails but small
  * edit distance means "same thing". The all-pairs edit-distance matrix is
  * quadratic and impossible at scale; the standard fix is BLOCKING: a cheap
  * content-derived equi-key (here the title's first `blockLen` chars) turns
  * the cartesian into an equi-join, and the expensive verifier (Levenshtein,
  * a codegen'd builtin on both engines) runs only inside blocks. Candidate
  * volume is Σ |block_A|·|block_B| — governed by key selectivity, measured
  * 1.4k pairs over 500² possible on the test corpus.
  *
  * Determinism: Levenshtein is exact integer edit distance; matches are all
  * pairs with lev ≤ maxLev (no arbitrary best-of tiebreak). Skew note: a
  * head block (generic prefix) is the dedup_exact AQE skew-split story.
  *
  * [[catalogB]] plants the linkage workload: every doc perturbed — %5 == 0
  * reversed (unmatchable by design, must be rejected), the rest a 3-char
  * ' v<n>' suffix (lev exactly 3, must match). */
object FuzzyJoin {

  def catalogA(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("a_id"),
      substring(col("text"), 1, 40).as("title_a"))

  def catalogB(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") + 1000000L).as("b_id"),
      when(col("doc_id") % 5 === 0, reverse(substring(col("text"), 1, 40)))
        .otherwise(concat(substring(col("text"), 1, 40), lit(" v"),
          (col("doc_id") % 3).cast("string")))
        .as("title_b"))

  /** (a_id, b_id, lev): all cross-catalog pairs sharing a block whose edit
    * distance is ≤ maxLev. */
  def linkTitles(a: DataFrame, b: DataFrame,
                 maxLev: Int = 3, blockLen: Int = 8): DataFrame = {
    val ab = a.withColumn("bk", substring(col("title_a"), 1, blockLen))
    val bb = b.withColumn("bk", substring(col("title_b"), 1, blockLen))
    ab.join(bb, Seq("bk"))
      .withColumn("lev", levenshtein(col("title_a"), col("title_b")).cast("long"))
      .where(col("lev") <= maxLev)
      .select("a_id", "b_id", "lev")
  }
}
