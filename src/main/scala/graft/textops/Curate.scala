package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs before
  * anything touches a tokenizer: PII redaction and Gopher-style document
  * quality gates. Both are pure built-in column expressions (regexp_replace /
  * regexp_extract_all / split arithmetic) — codegen'd, map-side, zero shuffle,
  * no UDFs — and both use regex constructs in the Java-regex ∩ RE2 common
  * subset so the DuckDB oracle runs the exact same patterns.
  */
object Curate {

  /** Plant within-doc repetition (the corpus has none): doc_id % 4 == 0
    * appends its own first 8 words twice — pure doc arithmetic, replanted
    * identically by the oracle. */
  def plantRepetition(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" "),
          array_join(slice(split(col("text"), " ", -1), 1, 8), " "), lit(" "),
          array_join(slice(split(col("text"), " ", -1), 1, 8), " ")))
        .otherwise(col("text")).as("text"))

  /** Gopher repetition battery (Rae et al. 2021, Table A1 beyond the
    * dup-word rule [[repetitionStats]] already covers): per doc,
    *  - top-{2,3,4}-gram character fraction: occurrences x chars of the most
    *    frequent word n-gram over doc chars (count DESC, gram ASC tie-break);
    *  - dup-{5,10}-gram coverage: characters covered by the UNION of all
    *    occurrences of n-grams appearing >= 2 times in the doc (interval
    *    union via the sorted-gap identity — word-gram ends are monotone in
    *    the start word, so min(next_start - start, len) is exact, the same
    *    identity [[DupSpans]] uses cross-document).
    * All basis points with trunc division; keep = every gate under its
    * Gopher threshold (20/18/16% tops, 15/10% dups). ONE typed map per doc —
    * no explode, no shuffle: per-doc hash maps bounded by doc length, the
    * 10^12-doc plan. Output: (doc_id, top2_bp, top3_bp, top4_bp, dup5_bp,
    * dup10_bp, keep). */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val t2 = topGramBp(text, 2)
        val t3 = topGramBp(text, 3)
        val t4 = topGramBp(text, 4)
        val d5 = dupGramBp(text, 5)
        val d10 = dupGramBp(text, 10)
        val keep = if (t2 <= 2000 && t3 <= 1800 && t4 <= 1600 && d5 <= 1500 && d10 <= 1000) 1L else 0L
        (id, t2, t3, t4, d5, d10, keep)
      }
      .toDF("doc_id", "top2_bp", "top3_bp", "top4_bp", "dup5_bp", "dup10_bp", "keep")
  }

  private def wordStarts(text: String): (Array[String], Array[Int]) = {
    val ws = text.split(" ", -1)
    val starts = new Array[Int](ws.length)
    var p = 0
    var i = 0
    while (i < ws.length) { starts(i) = p; p += ws(i).length + 1; i += 1 }
    (ws, starts)
  }

  /** Gram i..i+n-1 as a substring of the original text (identical bytes to
    * joining the words with single spaces). */
  private def gramAt(text: String, ws: Array[String], starts: Array[Int], i: Int, n: Int): String =
    text.substring(starts(i), starts(i + n - 1) + ws(i + n - 1).length)

  def topGramBp(text: String, n: Int): Long = {
    val L = text.length.toLong
    if (L == 0) return 0L
    val (ws, starts) = wordStarts(text)
    if (ws.length < n) return 0L
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i <= ws.length - n) {
      val g = gramAt(text, ws, starts, i, n)
      counts.update(g, counts.getOrElse(g, 0) + 1)
      i += 1
    }
    var bestG: String = null
    var bestC = 0
    counts.foreach { case (g, c) =>
      if (c > bestC || (c == bestC && (bestG == null || g.compareTo(bestG) < 0))) {
        bestG = g; bestC = c
      }
    }
    bestC.toLong * bestG.length * 10000L / L
  }

  def dupGramBp(text: String, n: Int): Long = {
    val L = text.length.toLong
    if (L == 0) return 0L
    val (ws, starts) = wordStarts(text)
    if (ws.length < n) return 0L
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i <= ws.length - n) {
      val g = gramAt(text, ws, starts, i, n)
      counts.update(g, counts.getOrElse(g, 0) + 1)
      i += 1
    }
    // occurrences of duplicated grams, in ascending start order; ends are
    // monotone so the gap identity gives the exact interval union
    var covered = 0L
    var prevStart = -1
    var prevLen = 0
    i = 0
    while (i <= ws.length - n) {
      val len = starts(i + n - 1) + ws(i + n - 1).length - starts(i)
      if (counts(text.substring(starts(i), starts(i) + len)) >= 2) {
        if (prevStart >= 0) covered += math.min(starts(i) - prevStart, prevLen).toLong
        prevStart = starts(i)
        prevLen = len
      }
      i += 1
    }
    if (prevStart >= 0) covered += prevLen.toLong
    covered * 10000L / L
  }

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

  /** Deterministic weighted priority sampling to an EXACT per-domain budget —
    * the companion to [[sampleMixture]] when the contract is "exactly k
    * documents per host, chosen with probability increasing in weight"
    * (token-budgeted corpus assembly, eval-set carving). The
    * Efraimidis-Spirakis shape: each doc draws a salted content-free variate
    * u = fnv64(salt:id) mod 2^32 and competes with key u/w (integer
    * fixed-point: (u << 16) / w, ties broken by doc_id) — the k SMALLEST keys
    * per host win, so heavier documents win proportionally more often, yet
    * the draw is a pure function of (doc key, salt): any cluster size, any
    * engine, the oracle recomputes the sample bit-for-bit. (True E-S uses the
    * exponential variate -ln(u)/w; the linear surrogate keeps the integer
    * determinism contract and the same monotone weight bias.) Plan shape: the
    * key is map-side; per-host top-k plans as WindowGroupLimit in Spark 4 —
    * every partition pre-prunes to k rows BEFORE the host shuffle, so the
    * exchange carries O(k * hosts * partitions) rows, never the corpus. */
  def prioritySample(docs: DataFrame, k: Int = 25, salt: String = "psamp"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val w = (if (text == null) 0 else text.length).toLong + 1L
        val u32 = java.lang.Long.remainderUnsigned(TextHash.fnv64(s"$salt:$id"), 1L << 32)
        (s"site${id % 7}.example.com", id, w, (u32 << 16) / w)
      }.toDF("host", "doc_id", "w", "priority")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col("priority"), col("doc_id"))
    keyed.withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k.toLong)
  }

  /** Deterministic stratified mixture sampling — the data-mixing stage of a
    * training pipeline: each domain (host) gets a keep RATE in basis points,
    * and a document survives iff a salted content-free hash of its identity
    * lands under the rate. Three properties a mixing stage needs at 10^12
    * docs, all by construction:
    *  - reproducible: the decision is a pure function of (doc key, salt) —
    *    re-running the pipeline, on any cluster size or engine (the oracle
    *    recomputes FNV-1a in SQL), keeps exactly the same documents;
    *  - map-side: rates broadcast as a plain map, ZERO shuffle over the
    *    corpus, no RNG state to coordinate;
    *  - composable: changing one domain's rate only adds/removes that
    *    domain's documents (bucket values never move), so mixture iterations
    *    don't churn the rest of the corpus.
    * Unknown hosts fall back to `defaultBp`. Returns every row with its
    * (bucket, keep) so downstream stages filter on `keep`. */
  def sampleMixture(docs: DataFrame, ratesBp: Map[String, Int],
                    defaultBp: Int = 0, salt: String = "mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ratesBp)
    docs.select(col("doc_id"), col("host")).as[(Long, String)]
      .map { case (id, host) =>
        val bucket = java.lang.Long.remainderUnsigned(TextHash.fnv64(s"$salt:$id"), 10000L)
        (id, host, bucket, bucket < bc.value.getOrElse(host, defaultBp).toLong)
      }
      .toDF("doc_id", "host", "bucket", "keep")
  }

  /** Deterministic stratified sampling with EXACT integer allocation — the
    * "give me exactly B documents, proportionally representative of (lang x
    * length) strata" stage of corpus construction. [[sampleMixture]] keeps a
    * RATE per domain (count comes out binomial); evaluation sets, ablation
    * corpora, and human-review batches need exact COUNTS per stratum.
    *
    * Allocation is Hamilton/largest-remainder apportionment, all integer:
    * base_s = floor(B*n_s/N); the L = B - sum(base) leftover seats go to the
    * largest remainders (B*n_s mod N), ties broken by stratum key, and the
    * quota never exceeds the stratum's population. Within a stratum,
    * selection is the smallest salted-FNV u32 variates (the [[prioritySample]]
    * move) — a pure function of (doc_id, salt), so the sample is reproducible
    * on any cluster size and the oracle replays it in SQL.
    *
    * Scale shape: the strata table is aggregate grain (#strata ~ langs x
    * buckets, << corpus), so the apportionment window over it is a 1-task
    * formality and the quota join broadcasts. The within-stratum selection
    * asks row_number <= quota — a NON-constant limit, which Spark cannot push
    * down — so the rank window is first capped with the CONSTANT
    * `row_number <= B` (plans as WindowGroupLimit: each stratum materializes
    * at most B rows before the sort) and the exact quota cut filters the
    * survivors. Returns the selected rows (doc_id, stratum, rnk, quota,
    * n_stratum). */
  def stratifiedSample(docs: DataFrame, budget: Long = 100L,
                       salt: String = "strat"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("doc_id"), col("text"), col("lang")).as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val len = (if (text == null) 0 else text.length).toLong
        val stratum = s"$lang|${math.min(len / 256L, 3L)}"
        val u32 = java.lang.Long.remainderUnsigned(TextHash.fnv64(s"$salt:$id"), 1L << 32)
        (id, stratum, u32)
      }.toDF("doc_id", "stratum", "priority")
    val counts = keyed.groupBy("stratum").agg(count(lit(1)).as("n_stratum"))
    // Hamilton apportionment over the aggregate-grain strata table: the
    // empty-frame windows are single-task BY DESIGN (strata count is tiny)
    val wAll = Window.partitionBy(lit(1))
    val wRem = Window.partitionBy(lit(1))
      .orderBy(desc("rem"), asc("stratum"))
    val quotas = counts
      .withColumn("n_total", sum(col("n_stratum")).over(wAll))
      .withColumn("base", expr(s"(${budget}L * n_stratum) div n_total")) // integer div, not Spark's float '/'
      .withColumn("rem", (lit(budget) * col("n_stratum")) % col("n_total"))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("seat_rank", row_number().over(wRem))
      .withColumn("quota",
        least(col("base") + (col("seat_rank") <= col("leftover")).cast("long"),
          col("n_stratum")))
      .select("stratum", "n_stratum", "quota")
    val wIn = Window.partitionBy("stratum").orderBy(col("priority"), col("doc_id"))
    keyed.withColumn("rnk", row_number().over(wIn).cast("long"))
      .filter(col("rnk") <= lit(budget)) // constant cap -> WindowGroupLimit
      .join(broadcast(quotas), "stratum")
      .filter(col("rnk") <= col("quota"))
      .select("doc_id", "stratum", "rnk", "quota", "n_stratum")
  }

  /** Null-safe single-space word split — the corpus contract the other
    * curation ops use. */
  private def words(t: String): Array[String] =
    if (t == null || t.isEmpty) Array.empty else t.split(" ", -1)

  private def benchGrams(benchDocs: DataFrame, n: Int): org.apache.spark.sql.Dataset[String] = {
    val spark = benchDocs.sparkSession
    import spark.implicits._
    benchDocs.select("text").as[String]
      .flatMap { t =>
        val ws = words(t)
        if (ws.length >= n) Some(ws.take(n).mkString(" ")) else None
      }
      .distinct()
  }

  /** Benchmark decontamination (the GPT-3/PaLM-style 13-gram overlap check):
    * flag training documents sharing any 13-word-gram with the evaluation
    * set, BEFORE the eval set leaks into training. The bench-gram set is
    * BROADCAST (eval sets are bounded — ~10^6-10^7 grams; production would
    * broadcast a Bloom filter over the same hashes, see
    * [[contaminationBloom]]), so the check is one map-side pass with ZERO
    * shuffle over the corpus — the only design that survives 10^12
    * documents.
    *
    * `benchDocs` contributes each qualifying document's FIRST 13-gram (the
    * eval prompt head); membership is tested on the exact gram string here
    * (at production scale the broadcast carries xxhash64 of the gram; at
    * eval-set sizes a 64-bit collision is ~10^-5 per corpus and only widens
    * the flag conservatively). */
  def contamination(docs: DataFrame, benchDocs: DataFrame, n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bench: Set[String] =
      benchGrams(benchDocs, n).collect().toSet // bounded: the EVAL set, not the corpus
    val bc = spark.sparkContext.broadcast(bench)
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        val ws = words(t)
        val total = math.max(ws.length - n + 1, 0)
        var hits = 0L
        var i = 0
        while (i < total) {
          // sliding join is O(words * n) chars; documents are paragraph grain
          if (bc.value.contains(ws.slice(i, i + n).mkString(" "))) hits += 1
          i += 1
        }
        (id, total.toLong, hits, hits > 0)
      }
      .toDF("doc_id", "n_grams", "n_contaminated", "contaminated")
  }

  /** The 100 TB form of [[contamination]]: the eval-gram set rides as a
    * BROADCAST Bloom filter (`org.apache.spark.util.sketch.BloomFilter`, the
    * codegen'd sketch Spark's own runtime filters use) instead of an exact
    * string set — ~3.6 bytes/gram at the 1e-6 default fpp, so a 10^7-gram
    * eval suite broadcasts in ~36 MB where the exact strings would not.
    * fpp is PER GRAM and compounds per document (a 300-gram doc is falsely
    * flagged w.p. ~300*fpp), which is why the default is 1e-6, not the
    * sketch-typical 1e-3: at 1e-6 even a 10^12-doc corpus mis-drops only
    * ~0.03% of documents. Guarantees the dedup direction cares about: NO
    * false negatives (a contaminated doc is always flagged —
    * property-tested as a superset of the exact op), and false positives
    * only ever widen the removal conservatively. Bit-layout is deterministic
    * for a given (gram set, expectedItems, fpp): inserts OR bits, so order
    * doesn't matter. */
  def contaminationBloom(docs: DataFrame, benchDocs: DataFrame, n: Int = 13,
                         fpp: Double = 1e-6, minCapacity: Long = 1L << 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = benchGrams(benchDocs, n).cache()
    // capacity floor: Spark's BloomFilterImpl derives bit positions by 32-bit
    // double hashing (h1 + i*h2), whose effective independence collapses on
    // tiny filters — measured 0.5% practical fpp at a CONFIGURED 1e-6 with a
    // 384-bit filter. Sizing for at least 2^16 items (~230 KB at 1e-6) keeps
    // occupancy, and therefore the practical rate, at spec; at real
    // eval-suite cardinalities the floor is a no-op.
    val expected = math.max(grams.count(), minCapacity)
    // Build by distributed treeAggregate over sketch.BloomFilter — NOT
    // DataFrame.stat.bloomFilter: that routes through bloom_filter_agg, which
    // silently CLAMPS the filter to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (8 MB) and 4M items
    // regardless of the requested fpp (r4 review, confirmed in the 4.1.2
    // bytecode) — at the 10^7-gram design scale that means ~10% practical
    // per-gram fpp and a falsely-flagged corpus. put/merge OR bits, so the
    // aggregation order doesn't affect the final bit layout.
    val bloom = grams.rdd.treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(expected, fpp))(
      (bf, g) => { bf.putString(g); bf },
      (a, b) => a.mergeInPlace(b))
    grams.unpersist()
    val bc = spark.sparkContext.broadcast(bloom)
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        val ws = words(t)
        val total = math.max(ws.length - n + 1, 0)
        var hits = 0L
        var i = 0
        while (i < total) {
          if (bc.value.mightContainString(ws.slice(i, i + n).mkString(" "))) hits += 1
          i += 1
        }
        (id, total.toLong, hits, hits > 0)
      }
      .toDF("doc_id", "n_grams", "n_flagged", "flagged")
  }

  /** CCNet-style LM quality scoring with a corpus-trained character-trigram
    * model, in integer fixed-point so the oracle recomputes it bit-for-bit.
    *
    * The pipeline stage: train a small LM on a trusted slice, score every
    * document by how "surprising" its text is under that LM, and gate or
    * bucket on the score (CCNet's perplexity head/middle/tail split). Here
    * the trusted slice is the deterministic 30% `doc_id % 10 < 3`, and the
    * float log-perplexity is replaced by an integer surrogate with the same
    * ordering intent: per trigram occurrence,
    *   surprise = min( (context_total * scale) div count(trigram), cap )
    * i.e. the truncated fixed-point inverse conditional probability
    * 1/P(c3|c1c2), capped at `scale*capFactor` (unseen trigrams score the
    * cap). Per document: n_tris, surprise_total, surprise_avg (trunc mean).
    * All divisions are single trunc-divisions on non-negative longs, so
    * Spark `div` and DuckDB `//` agree exactly.
    *
    * Scale shape: two passes over the corpus (LM build, scoring) — the CCNet
    * shape. Trigram extraction is a map-side explode; the LM build collapses
    * to distinct-trigram grain via partial aggregation (key space bounded by
    * charset^3, ≪ corpus); scoring joins the exploded stream to the
    * BROADCAST LM (a few MB even for full unicode text in practice) and
    * rolls up at doc grain, where partial aggregation again collapses each
    * partition to one row per doc before the shuffle. No corpus-sized
    * shuffle anywhere; switch the broadcast to a shuffle join only if the
    * observed trigram space outgrows executor memory.
    */
  def lmQuality(docs: DataFrame, scale: Long = 4096L,
                capFactor: Long = 1000L): DataFrame = {
    val cap = scale * capFactor
    val tris = docs
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .filter(length(col("lt")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(lt) - 2), i -> substring(lt, i, 3))")).as("tri"))
    val lmTri = tris.filter(col("doc_id") % 10 < 3)
      .groupBy("tri").agg(count(lit(1)).as("tc"))
      .withColumn("bi", substring(col("tri"), 1, 2))
    // context totals derived from the trigram table itself (sum over c3), so
    // boundary effects can't desync numerator and denominator
    val lmBi = lmTri.groupBy("bi").agg(sum("tc").as("bt"))
    val lm = lmTri.join(lmBi, "bi").select("tri", "tc", "bt")
    tris.join(broadcast(lm), Seq("tri"), "left")
      .select(col("doc_id"),
        when(col("tc").isNull, lit(cap))
          .otherwise(least(expr(s"(bt * ${scale}L) div tc"), lit(cap))).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tris"), sum("s").as("surprise_total"))
      .withColumn("surprise_avg", expr("surprise_total div n_tris"))
  }

  /** C4's blocklist document gate (Raffel et al. §2.2: drop any page that
    * carries a word from the static badword list). Word-BOUNDARY semantics —
    * exact token membership, not substring match, so "scrap" never fires on
    * "scrape". The list is a compile-time literal array inside one codegen'd
    * `filter()` lambda: map-side, zero shuffle, no broadcast variable even —
    * at 10^12 docs this gate costs exactly one pass over the token stream.
    * `n_blocked` (occurrence count) is reported so ablations can distinguish
    * one stray hit from saturation; `keep` is the C4 any-hit-drops rule.
    */
  def blocklistFilter(docs: DataFrame,
                      blocklist: Seq[String] = Seq("dup", "crash")): DataFrame = {
    val arr = blocklist.map(w => s"'${w}'").mkString("array(", ", ", ")")
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_blocked",
        expr(s"size(filter(ws, w -> array_contains($arr, w)))").cast("long"))
      .withColumn("keep", (col("n_blocked") === 0L).cast("long"))
      .select("doc_id", "n_words", "n_blocked", "keep")
  }

  /** CCNet's head/middle/tail corpus split: per LANGUAGE, bucket every
    * document by where its LM score lands in that language's score
    * distribution (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data" §4.4 — the tercile split
    * downstream consumers sample from). Scale shape: the distribution is
    * summarized as a (lang, score) HISTOGRAM — integer scores collapse
    * 10^12 docs into a per-lang table of distinct score values — the
    * cumulative window runs over that tiny table, and the resulting
    * cutoff map broadcasts back onto the doc stream. No doc-grain sort,
    * no per-lang repartition of the corpus.
    *
    * Tie rule (deterministic, oracle-recomputable): all docs sharing a
    * (lang, score) cell share a bucket; a cell is `head` iff the whole
    * cumulative prefix through it fits in the first third
    * (`cum*3 <= total`), `middle` iff it fits in the first two thirds,
    * else `tail`.
    *
    * The scored stream feeds BOTH the histogram and the final join from
    * the same doc-grain aggregation exchange, so the corpus is scored
    * once (exchange reuse — the tfidf df-from-tf pattern).
    */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val scored = lmQuality(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("surprise_avg").as("score"))
    val hist = scored.groupBy("lang", "score").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("lang").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLang = Window.partitionBy("lang")
    val cut = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(wLang))
      .withColumn("bucket",
        when(col("cum") * 3 <= col("total"), lit("head"))
          .when(col("cum") * 3 <= col("total") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select("lang", "score", "bucket")
    scored.join(broadcast(cut), Seq("lang", "score"))
      .select("doc_id", "lang", "score", "bucket")
  }

  /** Character-entropy quality gate (the CCNet/RefinedWeb low-entropy
    * filter: keyboard mashing, repeated padding, and binary-ish junk all
    * score LOW; natural prose sits in a narrow band). Shannon entropy's
    * float log is replaced by the same integer bit-length surrogate as
    * [[dsirWeights]]: H_bits = Σ_c k_c · (blen(n) − blen(k_c)) over the
    * doc's character counts, with entropy_milli = H_bits·1000 div n the
    * gate-able per-char score — bit-exact for the oracle. Map-side char
    * explode → (doc,char)-grain partial agg (≤ charset rows per doc) →
    * doc rollup. */
  def entropyQuality(docs: DataFrame): DataFrame = {
    docs
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"),
        explode(expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("c"))
      .groupBy("doc_id", "n", "c").agg(count(lit(1)).as("k"))
      .groupBy("doc_id", "n")
      .agg(sum(col("k") *
        (length(bin(col("n"))) - length(bin(col("k")))).cast("long")).as("eb"))
      .select(col("doc_id"), col("n").as("n_chars"), col("eb").as("entropy_bits"),
        expr("(eb * 1000) div n").as("entropy_milli"))
  }

  /** DSIR-style importance weight (Xie et al., "Data Selection for Language
    * Models via Importance Resampling"): score every doc by how much more
    * likely its character trigrams are under the TARGET-slice LM than under
    * the RAW-slice LM — log w(x) = Σ_tri [log p_t(tri) − log p_r(tri)], the
    * importance-resampling selection stage of a pretraining pipeline. The
    * float log is replaced by the integer BIT-LENGTH surrogate
    * (floor(log2)+1 = length(bin(x)), add-1 smoothed), so the oracle
    * recomputes the weight bit-for-bit:
    * weight_bits = Σ_tri [blen(ct+1) − blen(cr+1)]
    *             + n_tris · [blen(Tr+1) − blen(Tt+1)]
    * — marginal trigram LMs, with the global totals Tt/Tr folded out of the
    * per-trigram term (scalars, applied once per doc).
    *
    * Scale shape: [[lmQuality]]'s — one map-side trigram explode; BOTH LMs
    * collapse to distinct-trigram grain via partial aggregation (key space
    * bounded by charset^3 ≪ corpus); scoring joins the exploded stream to
    * the broadcast merged trigram table; the totals ride a 1-row broadcast
    * cross-join; the doc rollup is partial-agg. No corpus-sized shuffle. */
  def dsirWeights(docs: DataFrame, targetMod: Long = 0L,
                  rawModMin: Long = 5L): DataFrame = {
    val tris = docs
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .filter(length(col("lt")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(lt) - 2), i -> substring(lt, i, 3))")).as("tri"))
    val lmT = tris.filter(col("doc_id") % 10 === targetMod)
      .groupBy("tri").agg(count(lit(1)).as("ct"))
    val lmR = tris.filter(col("doc_id") % 10 >= rawModMin)
      .groupBy("tri").agg(count(lit(1)).as("cr"))
    val lm = lmT.join(lmR, Seq("tri"), "full")
      .select(col("tri"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = lm.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    tris.join(broadcast(lm), Seq("tri"), "left")
      .select(col("doc_id"),
        (length(bin(coalesce(col("ct"), lit(0L)) + 1)) -
          length(bin(coalesce(col("cr"), lit(0L)) + 1))).cast("long").as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tris"), sum("s").as("s_sum"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tris"),
        (col("s_sum") + col("n_tris") *
          (length(bin(col("tr") + 1)) - length(bin(col("tt") + 1))).cast("long"))
          .as("weight_bits"))
  }

  /** Largest-remainder (Hamilton) budget allocation — split an EXACT global
    * sample budget across strata (hosts) proportional to their sizes:
    * base = ⌊B·c_h / N⌋ per host, then the R = B − Σbase leftover slots go
    * to the hosts with the largest remainders (B·c_h mod N, host asc
    * tiebreak). The classic apportionment rule: totals always hit B
    * exactly, every host is within 1 of its real share — what
    * [[prioritySample]]'s per-host budgets should BE when a global budget
    * is the contract. All integer, oracle-mirrored.
    *
    * Scale shape: host counts = one map-side agg; total = broadcast 1-row;
    * the leftover winners = a top-R by (rem, host), i.e.
    * TakeOrderedAndProject over the host-grain table — no global window.
    * R itself is a bounded 1-row driver read (the BpeTrain argmax class). */
  def budgetAlloc(docs: DataFrame, budget: Long = 997L): DataFrame = {
    require(budget >= 0)
    val h = docs
      .select(concat(lit("site"), (col("doc_id") % 7).cast("string"),
        lit(".example.com")).as("host"))
      .groupBy("host").agg(count(lit(1)).as("n_docs"))
    val t = h.agg(sum("n_docs").as("total"))
    val b = h.crossJoin(broadcast(t))
      .select(col("host"), col("n_docs"),
        expr(s"(${budget}L * n_docs) div total").as("base"),
        expr(s"(${budget}L * n_docs) % total").as("rem"))
      .cache()
    val leftover = (budget - b.agg(sum("base")).head.getLong(0)).toInt
    val winners = b.orderBy(col("rem").desc, col("host")).limit(leftover)
      .select(col("host"))
    val out = b.join(winners.withColumn("w", lit(1L)), Seq("host"), "left")
      .select(col("host"), col("n_docs"),
        (col("base") + coalesce(col("w"), lit(0L))).as("alloc"))
    out
  }

  /** DSIR selection to an exact budget — the step after [[dsirWeights]]:
    * keep the k docs whose importance weight says they look most like the
    * target distribution (Xie et al. 2023 select by weight; the budget
    * variant is the deterministic twin of their Gumbel resampling). Total
    * order = (weight_bits DESC, doc_id) so the cut is unambiguous on any
    * engine. Scale shape: weights are doc-grain; the global top-k plans as
    * TakeOrderedAndProject (per-partition pre-prune to k, never a global
    * sort); the rank column is a window over the k survivors only. */
  def dsirSelect(docs: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = dsirWeights(docs)
      .select(col("doc_id"), col("weight_bits"))
      .orderBy(col("weight_bits").desc, col("doc_id"))
      .limit(k)
    // k rows — the unpartitioned window is budget-sized, not corpus-sized
    top.withColumn("rnk",
      row_number().over(Window.orderBy(col("weight_bits").desc, col("doc_id"))).cast("long"))
  }

  /** Deterministic eval-head leak planting (the dup_spans disclaimer move,
    * aimed at decontamination): docs with `doc_id % 7 == 3` get the first
    * n-gram of eval document `(doc_id % 2) * 41` appended, so the corpus
    * contains GENUINE cross-document contamination at any scale factor
    * (doc 41 exists from sf0.001 up) and the span extractor below has
    * non-trivial work. Heads ride a broadcast map keyed by eval doc id. */
  def plantEvalLeak(docs: DataFrame, benchDocs: DataFrame, n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val heads: Map[Long, String] = benchDocs.select("doc_id", "text").as[(Long, String)]
      .collect().iterator.flatMap { case (id, t) =>
        val ws = words(t)
        if (ws.length >= n) Some(id -> ws.take(n).mkString(" ")) else None
      }.toMap // bounded: the EVAL set
    val bc = spark.sparkContext.broadcast(heads)
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        val leak = if (id % 7 == 3) bc.value.get((id % 2) * 41) else None
        (id, leak.map(t + " " + _).getOrElse(t))
      }
      .toDF("doc_id", "text")
  }

  /** SPAN-LEVEL decontamination: instead of [[contamination]]'s per-document
    * flag, emit the exact character ranges of eval-set n-gram overlap — the
    * surgical alternative to dropping whole documents (what production
    * decontamination reports publish: which spans leaked, where). Matched
    * gram positions merge into maximal intervals via the sorted-gap identity
    * (two matches join iff their starts are ≤ n apart — same-length
    * intervals make max-end tracking unnecessary); word intervals convert to
    * char offsets through the per-doc running word-length prefix sum, so
    * `text.substring(start_char, end_char)` IS the leaked region.
    *
    * Scale shape: identical to [[contamination]] — the eval-gram set is
    * broadcast and everything else is ONE map-side pass over the corpus,
    * zero shuffle; per doc the match scan, interval merge, and prefix sums
    * are all O(words · n / chars). Output is contamination-sized, not
    * corpus-sized. */
  def contaminationSpans(docs: DataFrame, benchDocs: DataFrame, n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bench: Set[String] = benchGrams(benchDocs, n).collect().toSet
    val bc = spark.sparkContext.broadcast(bench)
    docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) =>
        val ws = words(t)
        val total = math.max(ws.length - n + 1, 0)
        // merged [startWord, endWord) intervals + gram count per island
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
        var i = 0
        while (i < total) {
          if (bc.value.contains(ws.slice(i, i + n).mkString(" "))) {
            if (spans.nonEmpty && i - spans.last._3 <= n) {
              val (a, _, _, ng) = spans.last
              spans(spans.length - 1) = (a, i + n, i, ng + 1)
            } else spans += ((i, i + n, i, 1L))
          }
          i += 1
        }
        if (spans.isEmpty) Iterator.empty
        else {
          val pre = new Array[Long](ws.length + 1)
          var k = 0
          while (k < ws.length) { pre(k + 1) = pre(k) + ws(k).length; k += 1 }
          spans.iterator.zipWithIndex.map { case ((a, b, _, ng), si) =>
            (id, si.toLong, a.toLong, b.toLong, pre(a) + a, pre(b) + b - 1, ng)
          }
        }
      }
      .toDF("doc_id", "span_idx", "start_word", "end_word",
        "start_char", "end_char", "n_grams")
  }

  private def wordPairShingles(t: String): Set[String] = {
    val w = words(if (t == null) "" else t)
    if (w.length < 3) Set(w.mkString(" "))
    else (0 until w.length - 1).map(i => w(i) + " " + w(i + 1)).toSet
  }

  /** Plant PARAPHRASE-level eval leaks: docs with `doc_id % 7 == 6` are
    * replaced by eval doc `(doc_id % 2) * 41`'s text minus its first word —
    * near-copies sharing no more than a rewritten fraction with the eval
    * set at the n-gram level the exact gates use, but word-shingle Jaccard
    * >= 4/5 (the Llama-3-style fuzzy-decontamination class). */
  def plantEvalNearDup(docs: DataFrame, benchDocs: DataFrame): DataFrame = {
    val ev = benchDocs.select(col("doc_id").as("bid"), col("text").as("etext"))
    docs.join(broadcast(ev), col("bid") === (col("doc_id") % 2) * 41, "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 6 && col("etext").isNotNull,
          expr("substring(etext, instr(etext, ' ') + 1)"))
          .otherwise(col("text")).as("text"))
  }

  /** Near-duplicate (fuzzy) decontamination — the paraphrase tier above
    * [[contamination]]'s exact grams and [[contaminationFolded]]'s folded
    * grams: flag corpus documents whose word-bigram-shingle Jaccard against
    * ANY eval document clears `thrNum/thrDen` (integer rational, never
    * float). Output per doc: qualifying-eval count, the smallest qualifying
    * eval id (-1 if none), and the verdict.
    *
    * Scale shape: the eval side is BROADCAST as (id, shingle set) — eval
    * suites are bounded — and each corpus doc screens the whole list with an
    * exact-safe integer size test (`J >= t` is impossible unless
    * `thrDen * min(|A|,|B|) >= thrNum * max(|A|,|B|)`), so full
    * intersections run only for size-compatible pairs; one map-side pass,
    * zero corpus shuffle. For 10^5+ eval items the upgrade path is the
    * banded cross-corpus join ([[Dedup.crossCorpusNearDup]]); the verdicts
    * are threshold-exact either way. */
  def decontaminateNearDup(docs: DataFrame, benchDocs: DataFrame,
                           thrNum: Long = 4L, thrDen: Long = 5L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val evs: Array[(Long, Set[String])] = benchDocs
      .select("doc_id", "text").as[(Long, String)]
      .collect() // bounded: the EVAL set
      .map { case (id, t) => (id, wordPairShingles(t)) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(evs)
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val s = wordPairShingles(t)
        var hits = 0L
        var minEid = -1L
        bc.value.foreach { case (eid, es) =>
          val lo = math.min(s.size, es.size).toLong
          val hi = math.max(s.size, es.size).toLong
          if (thrDen * lo >= thrNum * hi) { // exact-safe size screen
            val (small, big) = if (s.size <= es.size) (s, es) else (es, s)
            var inter = 0L
            small.foreach(x => if (big.contains(x)) inter += 1)
            val un = s.size.toLong + es.size.toLong - inter
            if (inter * thrDen >= un * thrNum) {
              hits += 1
              if (minEid < 0) minEid = eid
            }
          }
        }
        (id, hits, minEid, hits > 0)
      })
      .toDF("doc_id", "n_eval_matches", "eval_doc_id", "contaminated")
  }

  /** Case/punctuation fold for overlap matching — the GPT-3 decontamination
    * normalization (Brown et al. 2020 appendix C: lowercase, strip
    * punctuation, collapse whitespace) applied BEFORE gram comparison, so a
    * leak that was retyped with different casing or re-punctuated still
    * matches. Pure builtin column expressions: codegen, map-side. */
  def foldForOverlap(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Plant MANGLED eval-head leaks (the class exact decontamination misses):
    * docs with `doc_id % 7 == 5` get eval doc `(doc_id % 2) * 41`'s head
    * 13 words appended UPPERCASED and comma-joined — byte-wise nothing like
    * the eval gram, identical after [[foldForOverlap]]. */
  def plantMangledLeak(docs: DataFrame, benchDocs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val heads = benchDocs.filter(size(ws) >= 13)
      .select(col("doc_id").as("bid"),
        array_join(slice(ws, 1, 13), ", ").as("mangled"))
    docs.join(broadcast(heads), col("bid") === (col("doc_id") % 2) * 41, "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 5 && col("mangled").isNotNull,
          concat(col("text"), lit(" "), upper(col("mangled"))))
          .otherwise(col("text")).as("text"))
  }

  /** [[contamination]] under the [[foldForOverlap]] normalization on BOTH
    * sides — same broadcast-eval-grams, zero-corpus-shuffle shape, with the
    * fold fused into the same scan projection. */
  def contaminationFolded(docs: DataFrame, benchDocs: DataFrame, n: Int = 13): DataFrame = {
    def folded(df: DataFrame) =
      df.select(col("doc_id"), foldForOverlap(col("text")).as("text"))
    contamination(folded(docs), folded(benchDocs), n)
  }

  /** Per-eval-item leak report — the INVERSE view of [[contamination]]:
    * instead of flagging training docs, rank the EVALUATION items by how
    * widely their head n-gram has leaked into the corpus (the question an
    * eval-integrity review actually asks: which benchmark items are
    * compromised, and how badly). Output per eval doc: the corpus hit count
    * for its head gram, the smallest hitting doc (an exhibit for the
    * review), and a leaked-beyond-self verdict (the eval doc itself sits in
    * the corpus here, so 1 hit = self only).
    *
    * Scale shape: the eval-gram set is broadcast (bounded, the
    * [[contamination]] contract) and membership is tested INSIDE the
    * corpus-scan flatMap, so only hit rows (leak-sized, not corpus-sized)
    * ever leave the scan stage; the distinct + per-gram agg shuffle is
    * leak-grain, and the final join back to eval ids is broadcast. */
  def evalLeakReport(docs: DataFrame, benchDocs: DataFrame, n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // collect the (eval_doc_id, gram) pairs ONCE and derive both the
    // broadcast membership set and the join-side frame from the array
    // (ADVICE r5: the eval-side flatMap used to execute twice — once for the
    // broadcast collect, once as the join input). Bounded: the EVAL set.
    val evPairs = benchDocs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) =>
        val ws = words(t)
        if (ws.length >= n) Some((id, ws.take(n).mkString(" "))) else None
      }.collect()
    val ev = evPairs.toSeq.toDF("eval_doc_id", "gram")
    val bc = spark.sparkContext.broadcast(evPairs.map(_._2).toSet)
    val hits = docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) =>
        val ws = words(t)
        val total = math.max(ws.length - n + 1, 0)
        (0 until total).iterator
          .map(i => ws.slice(i, i + n).mkString(" "))
          .filter(bc.value.contains)
          .map(g => (g, id))
      }.toDF("gram", "doc_id")
      .distinct()
    val agg = hits.groupBy("gram").agg(
      count(lit(1)).as("n_docs_hit"),
      min("doc_id").as("min_hit_doc"))
    ev.join(agg, "gram")
      .select(col("eval_doc_id"), col("gram"), col("n_docs_hit"),
        col("min_hit_doc"), (col("n_docs_hit") > 1).as("leaked_beyond_self"))
  }

  /** Plant code-shaped documents (the corpus is pure prose, so the class
    * boundary needs synthetic positives): doc_id % 5 == 0 is rewritten into
    * source-like lines — the text's 8-word chunks each become
    * `"  let v<i> = (<chunk>);"`, newline-joined. Pure doc_id + word-slice
    * arithmetic (the line_dedup oracle's chunk grain), so DuckDB replants it
    * with a list comprehension. Built-in array expressions only — map-side,
    * codegen, zero shuffle. */
  def plantCode(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ", -1)
    val nLines = ceil(size(ws).cast("double") / 8.0).cast("int")
    docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        array_join(transform(sequence(lit(0), nLines - 1), i =>
          concat(lit("  let v"), i.cast("string"), lit(" = ("),
            array_join(slice(ws, i * 8 + 1, lit(8)), " "), lit(");"))), "\n"))
        .otherwise(col("text")).as("text"))
  }

  /** Code-vs-prose gate — the corpus-routing signal an LLM data pipeline
    * needs before language-ID or quality scoring (code documents fail prose
    * stopword/repetition gates and belong in a code pipeline with different
    * dedup grain). Features are exact integers over line structure:
    * statement-terminator line fraction, indented-line count, and
    * source-symbol density per 1000 chars (`;(){}[]=<>` — near zero in
    * prose). The verdict `2*semicolon_lines >= lines AND symbols/1000 >= 10`
    * is structural, not statistical: planted code scores ~60-70 per-1000
    * with every line terminated; prose scores 0 on both. All built-in
    * lambda/regex expressions — whole-stage codegen, zero shuffle; at
    * 10^12 rows this is one more fused scan projection. */
  def codeDetect(docs: DataFrame): DataFrame = {
    val lns = split(col("text"), "\n", -1)
    // r6: translate() deletes the same 10-char class as the old
    // regexp_replace char class without running a regex engine per row —
    // identical counts, plain char-table codegen
    val nSymbols = (length(col("text")) -
      length(translate(col("text"), ";(){}=<>[]", ""))).cast("long")
    docs.select(col("doc_id"),
        size(lns).cast("long").as("n_lines"),
        size(filter(lns, l => l.endsWith(";"))).cast("long").as("n_semicolon_lines"),
        size(filter(lns, l => l.startsWith("  "))).cast("long").as("n_indent_lines"),
        nSymbols.as("n_symbols"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("symbol_per_1000", expr("n_symbols * 1000 div n_chars"))
      .withColumn("is_code",
        (lit(2L) * col("n_semicolon_lines") >= col("n_lines")) &&
          col("symbol_per_1000") >= 10L)
  }
}
