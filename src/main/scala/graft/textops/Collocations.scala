package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level collocation mining (PMI bigrams) — the phrase-discovery stage
  * of a training-data pipeline (tokenizer merge seeding, stop-phrase lists,
  * boilerplate phrase detection), in the repo's integer bit-length log
  * surrogate so the oracle recomputes it bit-for-bit.
  *
  * PMI = log2(c(xy)·N / (c(x)·c(y))) is replaced by the surrogate
  * `bitlen(c(xy)) + bitlen(N) - bitlen(c(x)) - bitlen(c(y))` with
  * bitlen(v) = floor(log2 v)+1 = length(bin(v)) — each term is the exact
  * integer bit length, so the score is overflow-proof at ANY corpus size
  * (no c·N product that would exceed 64 bits at web scale), at the cost of
  * ±2-bit quantization; ties break by raw pair count then lexicographic
  * bigram, making the top-k total-ordered.
  *
  * Scale shape: ONE map-side explode emits, per token position, a struct of
  * the unigram and its right neighbor (NULL at document end), and a single
  * `rollup(w1, w2)` aggregation carries ALL THREE grains through one
  * exchange: `grouping_id`=0 rows are bigram counts, =1 rows are unigram
  * counts (every position contributes its word as `w1` exactly once, so the
  * (w1) subtotal IS c(w)), and the =3 grand total is N. The rollup alone is
  * not enough: any per-branch predicate that the optimizer can push below
  * the final aggregate (bare `gid = k` filters, inner-join `isnotnull` key
  * inference) lands between Expand and the partial aggregate, the branches'
  * map-side subtrees stop canonicalizing identically, and AQE re-runs the
  * corpus explode per branch (observed in this exact plan before the guard/
  * null-safe-join rewrite below — the tfidf df-from-tf failure mode). With
  * both countermeasures every branch shares ONE exchange (plan-pinned). The
  * corpus is scanned once; everything downstream runs at vocabulary grain.
  * The unigram⋈bigram joins are term-keyed
  * shuffle joins — NOT broadcast, a web-scale vocabulary is unbounded (the
  * Keywords.scala rule) — and the final top-k plans as
  * TakeOrderedAndProject.
  */
object Collocations {

  def pmiTopK(docs: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    val pairs = docs.select(split(col("text"), " ", -1).as("ws"))
      .select(explode(expr(
        "transform(sequence(1, size(ws)), i -> " +
          "struct(ws[i-1] AS w1, IF(i < size(ws), ws[i], CAST(NULL AS STRING)) AS w2))")).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val grains = pairs.rollup("w1", "w2")
      .agg(count(lit(1)).as("c"), grouping_id().as("gid"))
    // Every grain filter is welded to the aggregated value through the
    // vacuous-but-unprovable `c >= 1` guard (the tfidf idiom): a bare
    // `gid = k` predicate pushes below the final aggregate onto the Expand
    // output, each branch's map-side subtree stops canonicalizing
    // identically, and the corpus explode physically re-runs per branch.
    val gidIs = (k: Int) => when(col("c") >= 1, col("gid")) === k
    val bi = grains
      .where(gidIs(0) && when(col("c") >= 1, col("w2")).isNotNull && col("c") >= minCount)
      .select(col("w1"), col("w2"), col("c"))
    val uni = grains.where(gidIs(1))
    val total = grains.where(gidIs(3)).select(col("c").as("n"))
    // Null-safe join keys: a plain `===` key makes the inner join infer
    // `isnotnull` filters that push below each branch's aggregate — the same
    // subtree-splitting failure the guard above prevents. `<=>` infers none
    // and still plans as a hash equi-join.
    val u1 = uni.select(col("w1").as("u1w"), col("c").as("c1"))
    val u2 = uni.select(col("w1").as("u2w"), col("c").as("c2"))
    bi.join(u1, col("w1") <=> col("u1w"))
      .join(u2, col("w2") <=> col("u2w"))
      .crossJoin(broadcast(total))
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        (length(bin(col("c"))) + length(bin(col("n")))
          - length(bin(col("c1"))) - length(bin(col("c2")))).cast("long").as("pmi_bits"),
        col("c").as("n"))
      .orderBy(desc("pmi_bits"), desc("n"), asc("bigram"))
      .limit(k)
  }
}
