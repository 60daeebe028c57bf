package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs before
  * anything touches a tokenizer: PII redaction and Gopher-style document
  * quality gates. Both are pure built-in column expressions (regexp_replace /
  * regexp_extract_all / split arithmetic) — codegen'd, map-side, zero shuffle,
  * no UDFs — and both use regex constructs in the Java-regex ∩ RE2 common
  * subset so the DuckDB oracle runs the exact same patterns.
  */
object Curate {

  /** Shared with the oracles: word-boundary IPv4 and a pragmatic email shape. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Deterministically plant PII (the driver corpus has none): doc_id % 3 == 0
    * appends an email, doc_id % 5 == 0 an IPv4 — pure doc_id arithmetic so the
    * oracle replants identically in SQL. */
  def plantPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"))).otherwise(lit("")))
        .as("text"))

  /** Redact emails then IPs. Each count is taken on the text THAT REDACTION
    * PASS SAW (emails on the original, IPs on the email-redacted text), so
    * counts and redactions stay mutually consistent even when an email abuts
    * digits and the '>' of its placeholder exposes a fresh IP word boundary. */
  def scrubPii(docs: DataFrame): DataFrame = {
    val deEmailed = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    docs.select(col("doc_id"),
      regexp_replace(deEmailed, IpRe, "<IP>").as("clean_text"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(deEmailed, lit(IpRe), lit(0))).cast("long").as("n_ips"))
  }

  /** Within-document repetition statistics (the Gopher duplicate-fraction
    * family): exact integer duplicate-word and duplicate-bigram counts plus
    * the most-frequent-word count — all array expressions (distinct /
    * zip_with / transform), map-side, no shuffle, no UDF. The per-row
    * top-word scan is O(words * distinct); documents are line/paragraph
    * grain, so this stays constant work per row at any corpus size. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val n = size(ws).cast("long")
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    docs.select(col("doc_id"),
        n.as("n_words"),
        size(array_distinct(ws)).cast("long").as("n_distinct_words"),
        array_max(transform(array_distinct(ws), w => size(filter(ws, x => x === w))))
          .cast("long").as("top_word_n"),
        size(bigrams).cast("long").as("n_bigrams"),
        size(array_distinct(bigrams)).cast("long").as("n_distinct_bigrams"))
      .withColumn("n_dup_words", col("n_words") - col("n_distinct_words"))
      .withColumn("n_dup_bigrams", col("n_bigrams") - col("n_distinct_bigrams"))
  }

  /** Gopher-style quality gate (word-count window, mean-word-length window,
    * long-word share) in exact integer arithmetic: the corpus is single-spaced,
    * so sum(word chars) = length(text) - (n_words - 1), and the mean bound
    * 3 <= sum/n <= 10 becomes cross-multiplied integer comparisons. */
  def gopherQuality(docs: DataFrame,
                    minWords: Long = 50, maxWords: Long = 100000,
                    minMean: Long = 3, maxMean: Long = 10): DataFrame = {
    val nWords = size(split(col("text"), " ", -1)).cast("long")
    docs.select(col("doc_id"), nWords.as("n_words"),
        (length(col("text")).cast("long") - (nWords - 1L)).as("word_chars"),
        size(filter(split(col("text"), " ", -1), w => length(w) > 10)).cast("long")
          .as("n_long_words"))
      .withColumn("keep",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("word_chars") >= lit(minMean) * col("n_words") &&
          col("word_chars") <= lit(maxMean) * col("n_words")).cast("long"))
  }
}
