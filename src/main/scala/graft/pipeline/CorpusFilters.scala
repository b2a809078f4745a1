package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for a large-scale training-data pipeline:
  * PII redaction, Gopher-style repetition filtering, and benchmark
  * decontamination. Like [[TextStats]], the per-row ops are zero-shuffle
  * codegen projections; the one join op (decontamination) broadcasts the
  * small side so the corpus never shuffles.
  */
object CorpusFilters {

  /** RE2-compatible patterns (no backreferences/lookaround) so any SQL
    * oracle's regex engine agrees with Java's character for character.
    * [0-9] rather than \d everywhere: identical ASCII-only semantics in
    * both engines regardless of unicode flags.
    *
    * Recall envelope (documented contract, not a full detector):
    *  - IPv4 is range-valid per octet (0-255) — `999.999.999.999` is NOT
    *    an IP; zero-padded octets like `010` (zero-padding loggers and
    *    embedded devices emit these) match via the `0[0-9]{1,2}` branch,
    *    whose ≤3-digit values are always in range.
    *  - Phone covers NANP-style 3-3-4 groups with ` `/`.`/`-` separators,
    *    optional `(area)` parens, and an optional `+CC` international
    *    prefix (`+1 555-123-4567`, `(555) 123-4567`, `555.123.4567`).
    *    Unseparated 10-digit runs and non-NANP groupings are out of
    *    scope. A dotted 3-3-4 digit run is phone-shaped by definition
    *    even when the digits would be octet-invalid as an IP. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|0[0-9]{1,2}|[1-9]?[0-9])"
  val Ipv4Re = s"\\b$Octet(\\.$Octet){3}\\b"
  val PhoneRe = "(\\+[0-9]{1,3}[ .-]?)?(\\([0-9]{3}\\)[ .-]?|\\b[0-9]{3}[ .-])" +
    "[0-9]{3}[ .-][0-9]{4}\\b"

  /** PII scrub: per-doc match counts plus the redacted text
    * (email → `<EMAIL>`, then IPv4 → `<IP>`, then phone → `<PHONE>` —
    * counts are taken on the ORIGINAL text, and the replacement order is
    * part of the contract since earlier passes can in principle change
    * later matches). Pure regex projection: whole-stage codegen, no
    * shuffle, scan pruned to (id, text) — at 100 TB this is a map-only
    * pass. */
  def piiRedact(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val t = col(text)
    df.select(col(id),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ip"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_replace(regexp_replace(regexp_replace(t,
        lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
        lit(PhoneRe), lit("<PHONE>")).as("clean_text"))
  }

  /** Gopher-style repetition quality filter: unique-token fraction, most
    * frequent word/bigram occupancy, and a keep verdict. The per-doc
    * counting runs inside the native [[GraftRepStats]] expression — one
    * string pass, zero shuffle (the explode + double-groupBy alternative
    * shuffles the full token stream twice for what is a per-document
    * bounded reduction). All ratios are exact double divisions of integer
    * counts, bit-identical in any SQL oracle. */
  def repetition(df: DataFrame, id: String = "doc_id",
      text: String = "text", minUniqFrac: Double = 0.35,
      maxTopWordFrac: Double = 0.15,
      maxTopBigramFrac: Double = 0.08): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    df.select(col(id), call_function("graft_repstats", col(text)).as("r"))
      .select(col(id),
        col("r.n_tokens").as("n_tokens"), col("r.n_uniq").as("n_uniq"),
        when(col("r.n_tokens") > 0,
          col("r.n_uniq").cast("double") / col("r.n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("uniq_frac"),
        when(col("r.n_tokens") > 0,
          col("r.top_word").cast("double") / col("r.n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("top_word_frac"),
        when(col("r.n_tokens") > 1,
          col("r.top_bigram").cast("double") /
            (col("r.n_tokens") - 1).cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .withColumn("keep",
        col("uniq_frac") >= minUniqFrac &&
          col("top_word_frac") <= maxTopWordFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac)
  }

  /** URL pattern, case-insensitive scheme (RE2-compatible; its one group
    * is the optional PATH — domain extraction uses [[DomainRe]], whose
    * group 1 is the host). */
  val UrlRe = "(?i)https?://[A-Za-z0-9.-]+(/[^\\s]*)?"
  val DomainRe = "(?i)https?://([A-Za-z0-9.-]+)"

  /** URL extraction + domain-blocklist filter — the C4-style source
    * hygiene step: per doc the URL count, the count with a blocklisted
    * domain, and a keep verdict (no blocked URL). A URL is blocked when
    * its host (lowercased, trailing dots stripped — a sentence-ending
    * '.' is captured by the host char class) equals a blocklisted domain
    * OR is a subdomain of one (`a.spam.x` matches blocklist `spam.x`).
    * Zero-shuffle regex projection like [[piiRedact]]; the blocklist is
    * a handful of literals folded into the plan (a BIG blocklist would
    * instead broadcast-join the exploded domains — the
    * [[contaminationHits]] shape). */
  def urlFilter(df: DataFrame, blockedDomains: Seq[String],
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val blocked = blockedDomains.map(_.toLowerCase)
    val urls = regexp_extract_all(col(text), lit(UrlRe), lit(0))
    val domains = transform(urls, u =>
      regexp_replace(lower(regexp_extract(u, DomainRe, 1)), "\\.+$", ""))
    val hit = filter(domains, d => blocked.foldLeft(lit(false))((acc, b) =>
      acc || d === b || d.endsWith("." + b)))
    df.select(col(id),
        size(urls).cast("long").as("n_urls"),
        size(hit).cast("long").as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0)
  }

  /** Benchmark decontamination: docs of `corpus` sharing at least one word
    * n-gram with `bench` (the eval/benchmark set), with the count of
    * shared DISTINCT grams per doc. The standard pre-training step —
    * production uses n in 8..13; the gate entry uses n = 3 because the
    * synthetic corpus' tiny vocabulary makes longer grams all-unique.
    *
    * Scale shape: the benchmark side is always small (eval sets are MBs
    * against a 100 TB corpus), so its distinct-gram set is broadcast and
    * the corpus side stays entirely map-side — explode via the native
    * [[GraftShingles]] expression (already distinct per doc), hash-probe
    * the broadcast, then a combiner-heavy per-doc count. The corpus is
    * never shuffled by gram.
    */
  def contaminationHits(corpus: DataFrame, bench: DataFrame, n: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    def grams(df: DataFrame): DataFrame =
      df.select(col(id),
        explode(call_function("graft_shingles", col(text), lit(n))).as("g"))
    val benchGrams = grams(bench).select(col("g")).distinct()
    grams(corpus)
      .join(broadcast(benchGrams), "g")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Model-based quality scoring: an add-1-smoothed word-BIGRAM language
    * model trained on `ref` (a held-out reference slice — the CCNet /
    * Gopher-style filter trains on a trusted corpus like Wikipedia),
    * scoring every corpus doc. Output: one row per corpus doc —
    * (id, n_grams, logprob_q) where n_grams counts the doc's bigram
    * occurrences and logprob_q = Σ round(ln P(w₂|w₁) × 10⁶) as an exact
    * integer. Per-token log-perplexity = −logprob_q / (10⁶ · n_grams);
    * HIGH perplexity (very negative logprob_q per gram) marks
    * out-of-distribution docs — the usual drop signal.
    *
    * P(w₂|w₁) = (c₂(w₁w₂) + 1) / (c₁(w₁) + V) with c₂ = ref bigram
    * occurrences, c₁ = ref bigrams starting with w₁, V = ref vocabulary
    * size (add-1 keeps every count integer, so any SQL oracle reproduces
    * the probability bit-for-bit, and ln matches across engines — the
    * BM25 gate rides the same equality). The per-gram QUANTIZATION to an
    * integer is what makes the per-doc sum order-independent: raw double
    * sums are association-sensitive and would hash-differ between
    * engines on multi-hundred-term docs.
    *
    * Shape at scale (the [[contaminationHits]] shape): the reference
    * slice is small by design, so its count tables broadcast — V is
    * computed eagerly (one tiny job over the slice) and folded in as a
    * literal, the corpus side is a map-side [[GraftPosGrams]] projection
    * probing the broadcasts, and the only exchange is the per-doc
    * aggregate, combiner-reduced to one row per doc. The corpus is never
    * shuffled by gram. An EMPTY reference slice fails loudly: V = 0
    * would otherwise make every probability ln(Inf) and quantize to
    * Long.MaxValue — silent garbage scores. */
  // ---- trained quality classifier (logistic regression) -------------------

  /** Feature count of the trained quality classifier, bias included. */
  val ClassifierDim: Int = 6

  /** The classifier feature vector, as ONE array column over
    * [[TextStats.quality]]'s signals: (1, ln(1+chars), ln(1+tokens),
    * stop_ratio, punct_ratio, mean_word_len). Derived in Column space so
    * training and scoring share byte-identical arithmetic (Spark's
    * log/exp are java.lang.Math — the local-replica specs compare
    * exactly). */
  private def withFeatures(q: DataFrame): DataFrame =
    q.withColumn("x", array(
      lit(1.0),
      log(col("n_chars").cast("double") + 1.0),
      log(col("n_tokens").cast("double") + 1.0),
      col("stop_ratio"),
      col("n_punct").cast("double") /
        greatest(col("n_chars"), lit(1L)).cast("double"),
      col("mean_word_len")))

  /** (id, x) classifier features per doc — a zero-shuffle codegen
    * projection (the quality signals are one native `graft_quality`
    * pass). */
  def classifierFeatures(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    withFeatures(TextStats.quality(df, id, text)).select(col(id), col("x"))

  /** Distributed full-batch logistic-regression training over a LABELED
    * frame (id, text, label∈{0,1}) — the fastText-classifier pattern of
    * the public pipelines (FineWeb-Edu et al.): a model-based keep score
    * trained on a labeled sample, applied corpus-wide by
    * [[classifierScore]].
    *
    * Each iteration is one typed partial aggregation: the gradient
    * Σ x·(σ(w·x) − y) combines elementwise map-side, so `ClassifierDim`
    * doubles per partition cross the wire per step — the [[Similarity.kmeansRefine]]
    * economy. The labeled set is the scarce resource (human/LLM labels),
    * so it is bounded by construction; it persists once and is scanned
    * `iters` times. Floating sums are partition-order dependent — trained
    * weights are deterministic to ~1 ulp per add, and the spec pins one
    * distributed step against a local replica at 1e-9.
    *
    * Returns the weight vector for [[classifierScore]]. */
  def trainQualityClassifier(labeled: DataFrame, iters: Int = 100,
      lr: Double = 1.0, id: String = "doc_id", text: String = "text",
      label: String = "label"): Array[Double] = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val xy = classifierFeatures(labeled, id, text)
      .join(labeled.select(col(id), col(label).cast("double").as("y")), id)
      .select(col("x"), col("y")).as[(Array[Double], Double)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = xy.count().toDouble
    require(n > 0, "trainQualityClassifier: empty labeled frame")
    var w = new Array[Double](ClassifierDim)
    var it = 0
    while (it < iters) {
      val wB = w
      val grad = xy.map { case (x, y) =>
        var z = 0.0
        var i = 0
        while (i < ClassifierDim) { z += wB(i) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = new Array[Double](ClassifierDim)
        i = 0
        while (i < ClassifierDim) { g(i) = (p - y) * x(i); i += 1 }
        g
      }.groupByKey(_ => 0)
        .reduceGroups { (a, b) =>
          val s = new Array[Double](ClassifierDim)
          var i = 0
          while (i < ClassifierDim) { s(i) = a(i) + b(i); i += 1 }
          s
        }.map(_._2).head()
      val next = new Array[Double](ClassifierDim)
      var i = 0
      while (i < ClassifierDim) { next(i) = w(i) - lr * grad(i) / n; i += 1 }
      w = next
      it += 1
    }
    xy.unpersist(blocking = false)
    w
  }

  /** Corpus-wide scoring with FIXED weights: (id, score_q, keep) with
    * score_q = round(10⁶·σ(w·x)) and keep = score_q ≥ 500000 — the
    * [[lmScore]] quantization trick, so the whole row is SQL-mirrorable
    * arithmetic and the gate can hash-compare. Zero shuffles: weights
    * fold in as literals and the pass stays inside whole-stage codegen. */
  def classifierScore(df: DataFrame, weights: Array[Double],
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(weights.length == ClassifierDim,
      s"classifierScore needs $ClassifierDim weights, got ${weights.length}")
    val z = (0 until ClassifierDim)
      .map(i => lit(weights(i)) * element_at(col("x"), i + 1))
      .reduce(_ + _)
    withFeatures(TextStats.quality(df, id, text))
      .select(col(id),
        round(lit(1000000.0) / (exp(-z) + lit(1.0))).cast("long")
          .as("score_q"))
      .withColumn("keep", col("score_q") >= 500000)
  }

  def lmScore(corpus: DataFrame, ref: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    def bigrams(df: DataFrame): DataFrame =
      df.select(col(id),
        explode(call_function("graft_posgrams",
          coalesce(col(text), lit("")), lit(2))).as("g"))
    val refBg = bigrams(ref)
      .select(substring_index(col("g"), " ", 1).as("w1"), col("g"))
    val c2 = refBg.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = refBg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = ref.select(explode(TextStats.wsTokens(col(text))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    require(v > 0, "lmScore: the reference slice has no tokens (V = 0) — " +
      "every score would be quantized ln(Inf); train on a non-empty slice")
    val scored = bigrams(corpus)
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(broadcast(c2), Seq("g"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .select(col(id),
        round(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double")) *
          lit(1000000.0)).cast("long").as("qlp"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"), sum(col("qlp")).as("logprob_q"))
    corpus.select(col(id))
      .join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logprob_q"), lit(0L)).as("logprob_q"))
  }
}

