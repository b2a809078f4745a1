package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID heuristic, and document
  * fingerprinting.
  *
  * All of these are pure per-row projections built from
  * `org.apache.spark.sql.functions` (whole-stage codegen, no UDFs) — at
  * 100 TB they run map-side with zero shuffle, and column pruning keeps the
  * scan at exactly the needed columns. Each has an exact SQL oracle
  * (see [[graft.SparkEntry.oracleSql]]): the arithmetic is integer or a
  * deterministic left-fold, so results are bit-identical across engines.
  */
object TextStats {

  /** Whitespace tokens of a text column (empty-safe; NULL text reads as
    * an empty doc — without the coalesce every `size(...)` count would be
    * Spark's size(NULL) = −1, a silent wrong answer on corpora with null
    * text cells, and packSequences would fold −1 into its cumsums). */
  def wsTokens(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), t => t =!= "")

  /** BPE-ish pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the usual byte-pair pre-split shape. */
  val BpeishPattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"

  /** The pattern as a Spark SQL single-quoted literal (SQL string parsing
    * consumes one level of backslash). */
  private def sqlLit(pattern: String): String =
    "'" + pattern.replace("\\", "\\\\") + "'"

  /** (id, n_ws_tokens, n_bpeish_tokens, n_chars) per row. */
  def tokenCounts(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    df.select(col(id),
      size(wsTokens(col(text))).cast("long").as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(coalesce($text, ''), " +
        s"${sqlLit(BpeishPattern)}, 0)"))
        .cast("long").as("n_bpeish_tokens"),
      length(coalesce(col(text), lit(""))).cast("long").as("n_chars"))

  /** Stopword list shared with the SQL oracle. */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "or", "of", "to", "in")

  /** Quality scoring: per-doc length, token, punctuation and stopword
    * signals plus a boolean keep/drop verdict — the usual pre-training
    * corpus filter. All ratios are exact double divisions of integer
    * counts (deterministic bit-for-bit). */
  def quality(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    // all four counting signals in ONE native codegen pass (GraftQuality)
    // — integers bit-identical to the filter/isin + regexp_extract_all
    // column form this replaces (QualityKernelSpec pins the equality);
    // null text reads as an empty doc, as everywhere in TextStats
    val q = call_function("graft_quality", coalesce(col(text), lit("")))
    df.select(col(id), q.as("q"))
      .select(col(id), col("q.n_chars").as("n_chars"),
        col("q.n_tokens").as("n_tokens"), col("q.n_stop").as("n_stop"),
        col("q.n_punct").as("n_punct"))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          col("n_stop").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("mean_word_len",
        when(col("n_tokens") > 0,
          (col("n_chars") - (col("n_tokens") - 1)).cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("keep",
        col("n_tokens") >= 5 && col("n_chars") >= 20 &&
          col("stop_ratio") < lit(0.5))
  }

  /** Tiny marker-word profiles for the language-ID heuristic. Ordered —
    * ties resolve to the earliest profile (deterministic, mirrored in SQL). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "des"),
    "zh" -> Seq("de", "shi", "le"))

  /** N-gram/marker-word language ID: score = number of profile words present
    * in the token set; argmax with first-profile tie-break; no profile hit →
    * "und" (undetermined). */
  def langId(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    // per-profile hit counts in ONE native codegen pass (GraftLangHits) —
    // was one interpreted filter/isin lambda per profile; integers
    // identical (LangIdKernelSpec pins it), argmax/tie-break unchanged
    val q = call_function("graft_langhits", coalesce(col(text), lit("")))
    val withScores = df.select(col(id), q.as("q"))
      .select(col(id) +: LangProfiles.map { case (lang, _) =>
        col(s"q.s_$lang").as(s"s_$lang") }: _*)
    val best = LangProfiles.map { case (l, _) => col(s"s_$l") }
      .reduce((a, b) => greatest(a, b))
    val pick = LangProfiles.reverse.foldLeft(lit("und")) {
      case (acc, (lang, _)) =>
        when(col(s"s_$lang") === col("best") && col("best") > 0, lit(lang))
          .otherwise(acc)
    }
    withScores.withColumn("best", best)
      .select(col(id), pick.as("lang_pred"), col("best").cast("long").as("hits"))
  }

  /** Modulus of all rolling hashes — 2^31, small enough that `acc*31 + c`
    * never overflows a signed 64-bit int (so Spark and any SQL oracle agree
    * without wraparound semantics). */
  val FpMod: Long = 1L << 31

  /** Rolling polynomial hash of a string column (document fingerprint):
    * left fold (acc*31 + codepoint) mod 2^31 — the native codegen
    * [[GraftFpHash]] expression (one string pass; the HOF
    * `aggregate(split(text,''))` form evaluated the lambda interpreted and
    * allocated one single-char string per character). The identical left
    * fold is expressible in the SQL oracle via `ascii()`. Requires
    * `graft_fphash` registered in the session
    * ([[graft.tokenize.GraftFunctions.register]] — the DataFrame-level ops
    * here do it themselves). */
  def fingerprintCol(text: Column): Column =
    call_function("graft_fphash", text)

  /** (id, fp) per row. */
  def fingerprint(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    df.select(col(id), fingerprintCol(col(text)).as("fp"))
  }

  /** Word hash used by [[Dedup.simhash]]: same rolling hash per word. */
  def wordHashCol(word: Column): Column = fingerprintCol(word)

  /** Feature-hashing doc vectors (the hashing trick, Weinberger et al.
    * 2009): a `dim`-wide signed token-count vector per doc via the native
    * one-pass [[GraftHashVec]] kernel — no vocabulary, no external model,
    * ZERO shuffles (pure scan projection). The model-free bridge from the
    * text corpus into the embedding family: the output column feeds
    * [[Similarity]]'s ANN and semantic-dedup operators directly (exact
    * dup texts collide to identical vectors; sign-hashing keeps inner
    * products unbiased) — rename the id column to the consumers' `vec_id`
    * when feeding them (the PipelineMain `hashvec` op writes it renamed).
    * Deterministic integer arithmetic end to end, so a SQL oracle
    * reproduces every component bit-for-bit. */
  def hashingVectors(df: DataFrame, dim: Int = 64, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    df.select(col(id),
      call_function("graft_hashvec", col(text), lit(dim)).as("embedding"))
  }

  /** Document chunking for training/RAG pipelines: split each doc into
    * token windows of `size` starting every `step = size - overlap`
    * tokens. Starts past `n_tokens - overlap` are dropped (except start
    * 0): such a window is a strict SUB-SPAN of its predecessor — pure
    * duplicate content — and the kept predecessor provably reaches the
    * doc end (last kept start s < n-overlap ⇒ s+size ≥ n). Map-side
    * explode — zero shuffle at any corpus size; chunk_idx is the window
    * ordinal. The windowing arithmetic is integer-exact and mirrored in
    * the SQL oracle. */
  def chunk(df: DataFrame, size: Int, overlap: Int = 0,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val toks = wsTokens(col(text))
    df.select(col(id), toks.as("toks"))
      .filter(size_(col("toks")) > 0)
      .select(col(id), posexplode(expr(
        s"transform(filter(sequence(0, size(toks) - 1, $step), " +
          s"s -> s = 0 OR s < size(toks) - $overlap), " +
          s"s -> array_join(slice(toks, s + 1, $size), ' '))")))
      .select(col(id), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        size_(split(col("col"), " ")).cast("long").as("n_chunk_tokens"))
  }
  // functions.size shadowed by the `size` parameter above
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  /** Sequence packing (the pre-training concatenate-and-chunk step): per
    * `stratum` (source/language — the real pipelines pack within a
    * stratum), docs are laid out in id order and cut into fixed
    * `budget`-token bins; a doc's bin is where its first token lands.
    * Shuffle shape at 100 TB: ONE window per stratum (hash-partitioned by
    * the stratum column), not a global single-partition sort — the
    * within-stratum cumulative sum is the only data movement. Outputs are
    * integer-exact (window cumsum), mirrored in the SQL oracle. */
  def packSequences(df: DataFrame, budget: Long,
      stratum: String = "source", id: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratum)).orderBy(col(id))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(id), col(stratum),
        size_(wsTokens(col(text))).cast("long").as("n_tokens"))
      .withColumn("prev_cum",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(id), col(stratum), col("n_tokens"),
        // `div`, not `/`: Spark's Divide goes through double and can
        // misround near 2^53-scale cumsums; div is exact long division
        expr(s"prev_cum div ${budget}L").as("bin_id"),
        (col("prev_cum") % budget).as("bin_offset"))
  }

  /** Deterministic per-stratum Bernoulli sampling — the corpus-rebalancing
    * step of a training-data pipeline (downsample the dominant language or
    * source, keep the tail). The keep decision is pure integer hash
    * arithmetic on the id: reproducible across runs/engines (no RNG
    * state), map-only (no shuffle), and the split is STABLE under corpus
    * growth — a doc's fate never changes when other docs arrive, unlike
    * `sample()`. All arithmetic stays within int64 (id folded mod 2^31-1
    * before the multiply) so any SQL oracle reproduces it bit-for-bit.
    *
    * `rates`: stratum value → percent kept (0-100); `defaultPct` for
    * unlisted strata. The stratum column may itself be a projection like
    * [[langId]]'s `lang_pred` — the whole thing stays one codegen stage. */
  def stratifiedSample(df: DataFrame, rates: Map[String, Int],
      defaultPct: Int = 100, stratum: String = "lang_pred",
      id: String = "doc_id"): DataFrame = {
    val bucket =
      pmod(pmod(col(id).cast("long"), lit(2147483647L)) * lit(2654435761L),
        lit(2147483647L)) % lit(100)
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(stratum) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucket < pct)
  }
}
