package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Containment-based near-dup detection — the asymmetric twin of Jaccard
  * dedup: C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| flags A as QUOTED
  * INSIDE B even when B is much larger (syndicated articles inside portals,
  * chapters inside anthologies, READMEs inside vendored trees — the subset
  * duplication Jaccard's union denominator dilutes below any threshold).
  * Broder's "containment" companion to resemblance (SEQUENCES '97),
  * re-expressed as candidate generation by a bottom-k (KMV) gram sketch +
  * exact verification on hash arrays.
  *
  * Determinism contract (CLAUDE.md approximate-op rule — every BUCKETING
  * decision is integer-exact so the DuckDB oracle recomputes candidates AND
  * verdicts bit-for-bit):
  *   - gram key = FNV-1a of the w-word shingle text, masked to 63 bits
  *     (`& Long.MaxValue` ≡ SQL `% (1::HUGEINT << 63)`) so signed Scala and
  *     unsigned SQL sort identically — the prioritySample mask pattern;
  *   - sketch = the k SMALLEST gram keys per doc (slice of the sorted
  *     distinct array — no randomness, no floats);
  *   - candidates come from an ASYMMETRIC probe: each doc's k-key sketch is
  *     joined against the FULL gram-key index of every other doc. A
  *     symmetric sketch∩sketch bucket join — the Jaccard/minhash shape —
  *     fails exactly the case containment exists for: when A ⊂ B and B is
  *     much larger, B's bottom-k is dominated by its extra grams and the
  *     sketches share nothing. Probing A's minima into B's full posting
  *     set guarantees the pair buckets together whenever ANY of A's k
  *     smallest grams appears in B;
  *   - a gram key feeds candidates only while ≤ `maxBucket` docs contain it
  *     — the standard LSH hot-bucket guard, expressed as a HAVING the
  *     oracle mirrors (boilerplate-hot grams otherwise quadratically
  *     explode the pair set at corpus scale);
  *   - verdict: inter·10 ≥ |A|·9 (or |B|·9) in integer rationals.
  *
  * Scale shape: gram hashing is one map-side typed pass (gram TEXT never
  * leaves its partition — only sorted 8-byte key arrays, their exploded
  * keys, and the k-key sketch cross a shuffle, the dup_spans rule); the
  * probe join ships O(total grams) 16-byte rows — the ngram_novelty grain —
  * keyed on radix-sortable longs, capped per key, then distinct pair keys;
  * the exact verify joins the two hash ARRAYS to pair grain (array length ≤
  * distinct grams/doc) and intersects with the codegen array_intersect —
  * no text comparison, no all-pairs stage anywhere.
  */
object Containment {

  /** Deterministic quote plant: docs with id % 9 == 2 become
    * `text(id-1) ⧺ ' ' ⧺ own text` — full containment of the predecessor
    * (every w-gram of A survives contiguously inside B). One narrow
    * self-join on doc_id-1; a fixture builder, not a pipeline stage. */
  def plantQuotes(docs: DataFrame): DataFrame = {
    val prev = docs.select((col("doc_id") + 1).as("doc_id"), col("text").as("prev_text"))
    docs.select("doc_id", "text").join(prev, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 9 === 2 && col("prev_text").isNotNull,
          concat(col("prev_text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
  }

  /** (doc_id, sorted distinct 63-bit gram keys) for w-word shingles. */
  private def gramKeys(docs: DataFrame, w: Int): Dataset[(Long, Array[Long])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
        val keys =
          if (ws.length < w) Array.empty[Long]
          else (0 to ws.length - w).iterator
            .map(i => TextHash.fnv64(ws.slice(i, i + w).mkString(" ")) & Long.MaxValue)
            .toArray.distinct.sorted
        (id, keys)
      }
  }

  /** All candidate pairs with exact containment scores. Output:
    * (a, b, inter, na, nb, cont_a, cont_b, contained) with a < b,
    * cont_* in basis points, contained = 1 iff either side ≥ thr. */
  def containmentPairs(docs: DataFrame, w: Int = 5, k: Int = 6,
                       maxBucket: Int = 64,
                       thrNum: Long = 9L, thrDen: Long = 10L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val g = gramKeys(docs, w).toDF("doc_id", "gh")
      .where(size(col("gh")) > 0)
    val ge = g.select(col("doc_id"), explode(col("gh")).as("s"))
    val sk = g.select(col("doc_id"), explode(slice(col("gh"), 1, k)).as("s"))
    val okKeys = ge.groupBy("s").agg(count(lit(1)).as("bn"))
      .where(col("bn") <= maxBucket).select("s")
    val cand = sk.join(okKeys, "s").select(col("s"), col("doc_id").as("x"))
      .join(ge.select(col("s"), col("doc_id").as("y")), "s")
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    cand
      .join(g.select(col("doc_id").as("a"), col("gh").as("gha")), "a")
      .join(g.select(col("doc_id").as("b"), col("gh").as("ghb")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("gha"), col("ghb"))).cast("long").as("inter"),
        size(col("gha")).cast("long").as("na"),
        size(col("ghb")).cast("long").as("nb"))
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
        expr("(inter * 10000L) div na").as("cont_a"),
        expr("(inter * 10000L) div nb").as("cont_b"),
        when(col("inter") * thrDen >= col("na") * thrNum ||
             col("inter") * thrDen >= col("nb") * thrNum, 1L)
          .otherwise(0L).as("contained"))
  }
}
