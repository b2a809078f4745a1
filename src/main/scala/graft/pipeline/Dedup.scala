package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact (content
  * hash), n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale shape (the point at 100 TB):
  *   - exact: one hash-partitioned groupBy on a 128-bit content hash — the
  *     shuffle carries (hash, id), never the text;
  *   - n-gram Jaccard: an inverted shingle join — pairs are only generated
  *     for docs sharing a shingle, never the n² cross product; a df cap on
  *     hot shingles bounds the worst key (skew guard, logged);
  *   - MinHash+LSH: fixed-width signatures (numHashes ints per doc
  *     regardless of doc length), banded into buckets so candidate
  *     generation is a self-join on (band, bucket) — cost scales with
  *     collisions, not corpus²; candidates are verified with exact Jaccard
  *     so the output is precision-1 (and with enough bands recall-1 for
  *     thresholds well above the band curve);
  *   - SimHash: one 31-bit signature per doc (map-side only), near-dup
  *     candidates via band self-join, verified by Hamming distance.
  *
  * All hash math is integer mod 2^31 (no overflow in 64-bit, so any SQL
  * oracle reproduces it bit-for-bit).
  */
object Dedup {

  // ---- exact --------------------------------------------------------------

  /** Exact duplicate groups: (text_hash, keep_id, n_dups) — keep_id is the
    * smallest id per identical text (the canonical survivor). */
  def exact(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    df.groupBy(md5(col(text)).as("text_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Incremental exact dedup: per-doc verdicts for an arriving batch
    * against the persisted digest table of everything indexed before it
    * (any frame with a `text_hash` column — [[exact]]'s output serves).
    * Output one row per batch doc: (id, text_hash, is_new) with is_new =
    * this doc is the corpus-wide FIRST occurrence of its text (no base
    * doc and no lower-id batch doc shares the digest) — the keep verdict
    * of the production arrival loop, completing the incremental family
    * ([[spanDupsIncremental]], [[minhashLshPairsIncremental]]).
    *
    * Shape at scale: batch digests map-side + one Θ(batch) first-id
    * aggregate; the base table is probed by a BROADCAST of the batch's
    * digest set — the base scan is never repartitioned; the only
    * base-DERIVED exchange is the distinct over the probe-surviving
    * (batch-bounded) touched set (`broadcastDigests=false` degrades to an
    * SMJ of 32-byte digest rows, never the corpus). Pinned in
    * SpanDedupSpec's exactIncremental plan test. */
  def exactIncremental(batch: DataFrame, baseDigests: DataFrame,
      id: String = "doc_id", text: String = "text",
      broadcastDigests: Boolean = true): DataFrame = {
    // null text reads as an empty doc (the TextStats convention) on BOTH
    // sides: a null digest key would silently drop the doc from every
    // equality join — no verdict at all for a null-text arrival.
    // [[exact]]'s output represents null-text base docs under a null
    // text_hash (md5(NULL) groups as NULL there), so the base side
    // normalizes that group to the empty-string digest here.
    val EmptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    val b = batch.select(col(id),
      md5(coalesce(col(text), lit(""))).as("text_hash"))
    val baseD = baseDigests.select(
      coalesce(col("text_hash"), lit(EmptyMd5)).as("text_hash"))
    val firsts = b.groupBy(col("text_hash")).agg(min(col(id)).as("first_id"))
    val probe = if (broadcastDigests) broadcast(firsts) else firsts
    // semi-join FIRST, distinct after: the probe bounds the rows entering
    // the distinct to the batch's digest set, so the base table is scanned
    // (never exchanged) — distinct-before-probe would hash-aggregate every
    // base digest
    val touched = baseD
      .join(probe.select(col("text_hash")), Seq("text_hash"), "left_semi")
      .distinct()
      .withColumn("in_base", lit(true))
    val touchedSide = if (broadcastDigests) broadcast(touched) else touched
    b.join(probe, "text_hash")
      .join(touchedSide, Seq("text_hash"), "left")
      .select(col(id), col("text_hash"),
        (col(id) === col("first_id") && col("in_base").isNull).as("is_new"))
  }

  // ---- shingling ----------------------------------------------------------

  /** Distinct word n-gram shingles per doc: (id, shingle) — computed
    * entirely MAP-SIDE by the native codegen [[GraftShingles]] expression
    * (one string pass, dedup before the explode). Zero shuffles and zero
    * interpreted lambdas (r2 paid a doc-keyed window shuffle plus a
    * post-explode distinct shuffle; the intermediate r3 HOF rewrite paid
    * non-codegen `transform` evaluation); at 100 TB the shingle frame goes
    * straight from the scan into the inverted join's exchange. */
  def shingles(df: DataFrame, n: Int = 3, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    // call_function, not SQL-text interpolation: the column name may need
    // identifier quoting
    df.select(col(id),
      explode(call_function("graft_shingles", col(text), lit(n)))
        .as("shingle"))
  }

  /** Exact integer-threshold test `inter/union >= pct/100` without float
    * math: `inter * 100 >= pct * union`. */
  private def passes(inter: Column, uni: Column, pct: Int): Column =
    inter * 100 >= uni * pct

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle join.
    * Output: (id_a, id_b, inter, uni) with jaccard >= minPct/100, id_a < id_b.
    * `hotShingleCap`: shingles appearing in more docs are dropped from pair
    * generation (skew guard; None = exact). */
  def jaccardPairs(df: DataFrame, n: Int = 3, minPct: Int = 80,
      hotShingleCap: Option[Int] = None, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    // shingles recompute map-side per consumer (native expression, cheap)
    // instead of .cache(): no unbounded cached frame to leak per call, and
    // at corpus scale caching the shingle explosion is infeasible anyway —
    // recompute-over-materialize, same choice as the index build
    val sh = shingles(df, n, id, text)
    val counts = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val joinable = hotShingleCap match {
      case Some(cap) =>
        // the hot set is COLLECTED once (bounded: shingles over a
        // corpus-relative df cap are boilerplate-sized by construction)
        // and re-used as a local relation — the earlier hot.count() +
        // broadcast(hot) pair ran the full shingle-df aggregation TWICE
        // (once for the eager log count, once rebuilding the broadcast),
        // doubling the capped path's heaviest job (guide §2.4: don't
        // recompute a subtree two consumers can share)
        val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("shingle")
        val hotLocal = hot.collect()
        // no silent caps: dropping hot shingles bounds the worst join key
        // but can lose pairs whose ONLY shared shingles are hot — log what
        // was excluded so a recall investigation has the number
        if (hotLocal.nonEmpty) {
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"jaccardPairs: dropped ${hotLocal.length} shingles " +
              s"with df > $cap from pair generation (skew cap); pairs " +
              "sharing only hot shingles are not candidates")
          import scala.jdk.CollectionConverters._
          val hotDf = df.sparkSession.createDataFrame(
            hotLocal.toSeq.asJava, hot.schema)
          sh.join(broadcast(hotDf), Seq("shingle"), "left_anti")
        } else sh
      case None => sh
    }
    val a = joinable.select(col(id).as("id_a"), col("shingle"))
    val b = joinable.select(col(id).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    sized(inter, counts, id, minPct)
  }

  /** Attach set sizes + union and apply the threshold. */
  private def sized(inter: DataFrame, counts: DataFrame, id: String,
      minPct: Int): DataFrame = {
    val ca = counts.select(col(id).as("id_a"), col("n_sh").as("n_a"))
    val cb = counts.select(col(id).as("id_b"), col("n_sh").as("n_b"))
    inter.join(ca, "id_a").join(cb, "id_b")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(passes(col("inter"), col("uni"), minPct))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  // ---- incremental n-gram Jaccard ------------------------------------------

  /** The persisted state of incremental Jaccard: per-doc shingle SETS
    * (id, shingle) — the shingle inverted index. The frame is computed
    * entirely map-side ([[shingles]]), so "building state" is writing it;
    * per-batch maintenance is a plain append (sets carry no corpus-level
    * aggregation). `hashShingles` stores 8-byte xxhash64 keys instead of
    * n-word strings — the trillion-key tradeoff of [[gramCounts]]'
    * hashGrams: a collision can only ADD intersection counts at ppm rates
    * (an extra candidate/slightly-inflated jaccard, never a missed dup).
    * Must match across every table probed or merged together. */
  def shingleSets(df: DataFrame, n: Int = 3, id: String = "doc_id",
      text: String = "text", hashShingles: Boolean = false): DataFrame = {
    val sh = shingles(df, n, id, text)
    if (hashShingles) sh.select(col(id), xxhash64(col("shingle")).as("shingle"))
    else sh
  }

  /** Companion state: per-doc set sizes (id, n_sh) — Θ(batch) to build,
    * appended per batch; lets the incremental op attach exact jaccard
    * denominators without re-scanning the base set table per query. */
  def shingleSetSizes(sets: DataFrame, id: String = "doc_id"): DataFrame =
    sets.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))

  /** Companion state for the skew cap: corpus-wide shingle document
    * frequency (shingle, df) — additive like [[gramCounts]]; keep
    * per-batch layers and squash at compaction cadence via
    * [[mergeShingleDf]]. */
  def shingleDfCounts(sets: DataFrame): DataFrame =
    sets.groupBy(col("shingle")).agg(count(lit(1)).as("df"))

  /** Fold per-batch df layers into one (additive). */
  def mergeShingleDf(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("shingle")).agg(sum(col("df")).as("df"))

  /** Incremental exact n-gram Jaccard: near-dup pairs TOUCHING an arriving
    * batch, given the persisted shingle state of everything before it.
    * Output rows are IDENTICAL to
    * `jaccardPairs(base ∪ batch).filter(id_a ∈ batch ∨ id_b ∈ batch)` for
    * disjoint id sets — including under `hotShingleCap`, whose df is the
    * corpus-relative base+batch total (base df from the persisted
    * `baseDf` table + the batch's own Θ(batch) counts), so the cap
    * engages exactly where a full recompute's would. Completes the
    * incremental family (exact digests / MinHash bands / span gram-counts
    * / shingle sets) with its exact-recall member.
    *
    * Shape at scale:
    *  1. batch shingles map-side + one Θ(batch) self-join for
    *     batch-internal pairs;
    *  2. cross pairs: the base set table is SCANNED under a broadcast of
    *     the batch's shingles — intersection counts come straight off the
    *     probe join's partial aggregation; the base side pays zero
    *     exchange. `broadcastShingles=false` degrades to an SMJ that
    *     shuffles the (hashed) shingle table — 16-byte rows, never text;
    *  3. denominators from the persisted size table (or a one-pass
    *     derivation when `baseSizes` is absent): `sized`'s joins see a
    *     pair-list-sized left side, so AQE broadcasts it over the size
    *     scan.
    *
    * The hot-shingle set under the cap is assembled from three bounded
    * sources (base-hot by scan filter, base+batch crossers by broadcast
    * probe, batch-only hot) and broadcast-anti-joined off both sides —
    * the same logged no-silent-caps contract as [[jaccardPairs]]. */
  def jaccardPairsIncremental(batch: DataFrame, baseSets: DataFrame,
      baseSizes: Option[DataFrame] = None, baseDf: Option[DataFrame] = None,
      n: Int = 3, minPct: Int = 80, hotShingleCap: Option[Int] = None,
      id: String = "doc_id", text: String = "text",
      hashShingles: Boolean = false,
      broadcastShingles: Boolean = true): DataFrame = {
    require(hotShingleCap.isEmpty || baseDf.nonEmpty,
      "hotShingleCap needs the persisted shingle-df table (baseDf)")
    val bs = shingleSets(batch, n, id, text, hashShingles)
    val bCounts = shingleSetSizes(bs, id)
    val (joinableB, joinableBase) = hotShingleCap match {
      case Some(cap) =>
        val batchDf = shingleDfCounts(bs)
        val bdf = baseDf.get
        // shingles over the cap on the COMBINED corpus: base-alone hot,
        // base+batch crossing the cap (broadcast probe of the Θ(batch)
        // df delta — the base table is scanned, never shuffled), and
        // batch-alone hot; each source is boilerplate-sized
        val hot = bdf.filter(col("df") > cap).select("shingle")
          .unionByName(bdf
            .join(broadcast(batchDf.withColumnRenamed("df", "bdf")),
              Seq("shingle"))
            .filter(col("df") + col("bdf") > cap).select("shingle"))
          .unionByName(batchDf.filter(col("df") > cap).select("shingle"))
          .distinct()
        // collect-once like [[jaccardPairs]]' cap: the count + two
        // broadcast(hot) sites would otherwise evaluate the 3-way union
        // THREE times (bounded: the combined-df-over-cap set)
        val hotLocal = hot.collect()
        if (hotLocal.nonEmpty)
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"jaccardPairsIncremental: dropped ${hotLocal.length} " +
              s"shingles with combined df > $cap from pair generation " +
              "(skew cap)")
        import scala.jdk.CollectionConverters._
        val hotDf = batch.sparkSession.createDataFrame(
          hotLocal.toSeq.asJava, hot.schema)
        (bs.join(broadcast(hotDf), Seq("shingle"), "left_anti"),
          baseSets.join(broadcast(hotDf), Seq("shingle"), "left_anti"))
      case None => (bs, baseSets)
    }
    val probe = if (broadcastShingles) broadcast(joinableB) else joinableB
    val intra = joinableB.select(col(id).as("id_a"), col("shingle"))
      .join(probe.select(col(id).as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val cross = joinableBase
      .select(col(id).as("base_id"), col("shingle"))
      .join(probe.select(col(id).as("batch_id"), col("shingle")),
        Seq("shingle"))
      .select(least(col("base_id"), col("batch_id")).as("id_a"),
        greatest(col("base_id"), col("batch_id")).as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val inter = intra.unionByName(cross)
    // denominators are UNCAPPED set sizes (the full op counts before
    // capping); sized()'s inner joins drop the uninvolved base rows
    val counts = bCounts.unionByName(
      baseSizes.getOrElse(shingleSetSizes(baseSets, id)))
    sized(inter, counts, id, minPct)
  }

  /** Connected components over a near-dup pair list → (id, rep_id) with
    * rep = the component's minimum id: the survivor-selection step after
    * ANY pair generator (exact, jaccard, minhash, simhash, embedding) —
    * near-dup relations are not transitive, so keep-one-per-pair is wrong;
    * keep-one-per-component is the standard pipeline step.
    *
    * Shape: iterative min-label propagation — each round every vertex
    * takes the minimum label in its neighborhood (one edge join + one
    * groupBy per round, nothing larger than the pair list is ever
    * materialized). Rounds = graph diameter: dup clusters are near-cliques
    * (1-2 rounds); if a corpus ever links long chains, the O(log n)
    * large-star/small-star contraction is the drop-in upgrade, same I/O
    * shape. Converges by fixpoint (changed-count = 0), capped at
    * `maxIters` as a runaway guard.
    *
    * Adaptive small-graph path (the broadcast-join move): a pair list at
    * or under `localThreshold` edges collects to the driver and runs
    * union-find there — one job instead of per-iteration jobs, bounded
    * driver memory (16 bytes/edge ≈ 16 MB at the 2^20 default). Near-dup
    * pair lists are SELECTIVE outputs (the dups, not the corpus), so this
    * is the common case even at large corpus scale; a corpus where it
    * isn't takes the iterative path automatically.
    *
    * The returned frame from the iterative path is PERSISTED (it was
    * materialized by the last convergence check; its inputs are already
    * unpersisted) — call `.unpersist()` when done with it. */
  def components(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 50,
      localThreshold: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the pair list ONCE: both paths read it more than once,
    // and an expensive upstream generator (the inverted shingle join) must
    // not recompute per read — nor per iteration. A caller that ALREADY
    // persisted the pair frame keeps ownership: unpersisting it here would
    // silently evict a frame the caller reuses downstream (the r4 catalog
    // recomputed the jaccard join per entry exactly because of this)
    val callerPersisted =
      pairs.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val p = if (callerPersisted) pairs else pairs.persist()
    val nEdges = p.count()
    if (nEdges <= localThreshold) {
      val es = p.select(col(idA).cast("long"), col(idB).cast("long"))
        .as[(Long, Long)].collect()
      if (!callerPersisted) p.unpersist(blocking = false)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val px = parent.getOrElse(x, x)
        if (px == x) x else { val r = find(px); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
      return ids.toSeq.sorted.map(i => (i, find(i)))
        .toDF("id", "rep_id")
    }
    val edges = p.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(p.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id")).persist()
    var iters = 0
    var changed = 1L
    while (changed > 0 && iters < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("rep")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("rep")).as("nbr_rep"))
      val stepped = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), col("rep").as("old"),
          least(col("rep"), coalesce(col("nbr_rep"), col("rep"))).as("rep"))
        .persist()
      changed = stepped.filter(col("rep") < col("old")).count()
      labels.unpersist(blocking = false)
      labels = stepped.select(col("id"), col("rep"))
      iters += 1
    }
    // no silent caps: a diameter beyond maxIters means the labels have NOT
    // reached the fixpoint — say so instead of returning wrong rep_ids
    if (changed > 0)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"components: NOT converged after $maxIters iterations " +
          s"($changed labels still changing) — rep_ids are upper bounds, " +
          "not component minima; raise maxIters for this graph")
    edges.unpersist(blocking = false)
    if (!callerPersisted) p.unpersist(blocking = false)
    labels.select(col("id"), col("rep").as("rep_id"))
  }

  /** Duplicate-cluster survivor selection — the last mile of the dedup
    * story: [[components]] over a near-dup pair list picks the clusters,
    * and within each cluster the BEST-quality doc survives instead of the
    * arbitrary lowest id. Quality order (deterministic, SQL-mirrorable):
    * passes the [[TextStats.quality]] keep filter first, then more
    * tokens, then lower id as the final tie-break.
    *
    * Output: one row per clustered doc — (id, rep_id, is_survivor).
    * Docs in no cluster are implicitly survivors (not emitted — the pair
    * list is the dups, not the corpus, and so is this frame).
    *
    * Shape at scale: the cluster frame is SELECTIVE (components of the
    * pair list); quality is a map-side projection of the corpus; the
    * per-cluster rank windows over the small joined frame only — the
    * corpus is never shuffled. */
  def survivors(df: DataFrame, pairs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val comp = components(pairs).select(col("id").as(id), col("rep_id"))
    val q = TextStats.quality(df, id, text)
      .select(col(id), col("n_tokens"), col("keep"))
    val w = Window.partitionBy(col("rep_id"))
      .orderBy(col("keep").desc, col("n_tokens").desc, col(id))
    comp.join(q, id)
      .withColumn("rk", row_number().over(w))
      .select(col(id), col("rep_id"), (col("rk") === 1).as("is_survivor"))
  }

  // ---- span-level exact dedup ----------------------------------------------

  /** Every word k-gram occurrence at its position: (id, pos, g) with pos
    * 1-based (SQL-subscript parity) — map-side via the native
    * [[GraftPosGrams]] expression, zero shuffle. */
  def positionalGrams(df: DataFrame, k: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    df.select(col(id),
        posexplode(call_function("graft_posgrams", col(text), lit(k))))
      .select(col(id), (col("pos") + 1).as("pos"), col("col").as("g"))
  }

  /** Span-level exact dedup (the suffix-array-style dedup family of the
    * public training-data literature — Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"): maximal intervals of tokens
    * COVERED by duplicated k-token windows (windows occurring at least
    * `minOcc` times corpus-wide — so within-doc repetition counts too: a
    * doubled license block inside one doc is a duplicated span). Whole-doc
    * exact dedup misses shared boilerplate inside otherwise-distinct docs;
    * near-dup misses it when the host docs differ; THIS op is the one
    * that finds the block itself.
    *
    * Coverage, not per-window repetition, is the contract (it is what
    * [[removeSpans]] strips): overlapping or ABUTTING duplicated windows
    * merge into one interval, so a span's interior windows need not
    * themselves repeat — e.g. duplicated windows starting at 1 and k+1
    * only still emit the single covered interval [1, 2k].
    *
    * Output: (id, span_start, span_len, span_hash) — 1-based token start,
    * token length, and the rolling fingerprint of the span text
    * ([[TextStats.fingerprintCol]] arithmetic): identical spans share
    * span_hash (byte-identical repeated blocks cluster by it), but a
    * merged span is NOT guaranteed to occur elsewhere as a unit — treat
    * span_hash as an exact-text group key, not a recurrence proof.
    *
    * Shape at scale (never a suffix array on the driver):
    *  1. positional k-grams map-side (native expression);
    *  2. ONE hash-partitioned groupBy over the gram stream counts
    *     occurrences; the surviving duplicated-gram set is SELECTIVE
    *     (dup grams, not the corpus) and joins back by gram — AQE picks
    *     broadcast when it is small, SMJ when a boilerplate-heavy corpus
    *     makes it big;
    *  3. duplicated window starts merge into maximal spans with one
    *     per-doc gaps-and-islands window pass (windows [p, p+k-1] merge
    *     while the next start is <= prev + k);
    *  4. the span fingerprint reads the doc's token slice map-side.
    * `hashGrams` is the 100-TB lever: project each gram to its xxhash64
    * BEFORE the exchange, so the count shuffle and the join carry 8-byte
    * longs instead of k-word strings (same plan shape, ~10-20× smaller
    * keys on prose). A 64-bit collision falsely marks ONE window as
    * duplicated — over-redaction at ppm rates on trillion-gram corpora,
    * never a missed duplicate (no false negatives). Strings (the default)
    * keep the gate SQL-oracle-exact. */
  def spanDups(df: DataFrame, k: Int = 8, minOcc: Int = 2,
      id: String = "doc_id", text: String = "text",
      hashGrams: Boolean = false): DataFrame = {
    // positional grams recompute map-side per consumer (native expression,
    // cheap) — same recompute-over-materialize call as jaccardPairs
    val rawGrams = positionalGrams(df, k, id, text)
    val grams = if (hashGrams)
      rawGrams.select(col(id), col("pos"), xxhash64(col("g")).as("g"))
    else rawGrams
    val dupG = grams.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc).select("g")
    val dupPos = grams.join(dupG, "g").select(col(id), col("pos"))
    spansFromDupPositions(df, dupPos, k, id, text)
  }

  /** Steps 3-4 of [[spanDups]], shared with [[spanDupsIncremental]]:
    * merge duplicated window starts into maximal covered intervals
    * (gaps-and-islands over one per-doc window pass) and fingerprint each
    * span's token slice map-side. */
  private def spansFromDupPositions(df: DataFrame, dupPos: DataFrame,
      k: Int, id: String, text: String): DataFrame = {
    val w = Window.partitionBy(col(id)).orderBy(col("pos"))
    val spans = dupPos
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(w) + k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(id), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k - min(col("pos"))).cast("long").as("span_len"))
    val toks = df.select(col(id), TextStats.wsTokens(col(text)).as("toks"))
    spans.join(toks, id)
      .select(col(id), col("span_start").cast("long").as("span_start"),
        col("span_len"),
        TextStats.fingerprintCol(array_join(
          slice(col("toks"), col("span_start"), col("span_len").cast("int")),
          " ")).as("span_hash"))
  }

  /** The persisted state of incremental span dedup: corpus-wide k-gram
    * occurrence counts (g, occ) — ONE hash-partitioned shuffle over the
    * counted slice, the same exchange [[spanDups]] step 2 pays. Build it
    * once over the base corpus, persist it (parquet / the snapshot
    * store), and feed each new batch to [[spanDupsIncremental]]; fold the
    * batch's own counts in with [[mergeGramCounts]] — the LSM analog of
    * the posting merge: per-batch cost is Θ(batch), never a base rescan.
    * `hashGrams` must match across every table that will be merged or
    * probed together (8-byte xxhash64 keys vs exact gram strings — the
    * same 100-TB tradeoff documented on [[spanDups]]). */
  def gramCounts(df: DataFrame, k: Int = 8, id: String = "doc_id",
      text: String = "text", hashGrams: Boolean = false): DataFrame = {
    val rawGrams = positionalGrams(df, k, id, text)
    val grams = if (hashGrams)
      rawGrams.select(xxhash64(col("g")).as("g"))
    else rawGrams.select(col("g"))
    grams.groupBy(col("g")).agg(count(lit(1)).as("occ"))
  }

  /** Fold a batch's gram counts into the persisted table (additive, like
    * posting merges). Union + re-aggregate shuffles both sides, so run it
    * as COMPACTION cadence, not per batch: keep per-batch count layers and
    * squash at a layer bound, exactly the index's merge economy —
    * [[spanDupsIncremental]] reads layers unioned through this same
    * aggregate, so querying N layers needs no pre-squash. */
  def mergeGramCounts(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("g")).agg(sum(col("occ")).as("occ"))

  /** Incremental span-level dedup: spans over the docs of `batch` ONLY,
    * given the persisted corpus-wide gram counts of everything indexed
    * before it. Output rows are IDENTICAL to
    * `spanDups(base ∪ batch).filter(id ∈ batch)` — the duplicated-gram
    * predicate is the same global occurrence count, totalled here as
    * batch_occ + base_occ — at Θ(batch) cost: the base corpus is never
    * re-grammed, re-shuffled, or even re-read.
    *
    * Shape at scale (the streaming/merge-loop economy — r4 verdict
    * "Next round" #8):
    *  1. batch positional grams map-side; batch counts = ONE Θ(batch)
    *     shuffle;
    *  2. the base count table is probed by a BROADCAST of the batch's
    *     distinct gram set — a pure scan of base counts, zero exchange on
    *     the base side (PlanSpec-pinned); parquet bloom/min-max pruning
    *     applies when the table is so stored. `broadcastTouched=false`
    *     degrades to an SMJ for a batch whose gram set outgrows the
    *     broadcast limit — shuffling the COUNT table (8-16 bytes a row),
    *     still never the corpus;
    *  3. steps 3-4 are [[spanDups]]'s own island merge + fingerprint,
    *     over batch docs only.
    *
    * A batch-side span can OVERLAP base-side text that a full recompute
    * would now also mark (a base doc's gram newly pushed over `minOcc` by
    * this batch). Those base-side spans are exactly
    * `spanDupsIncremental(affectedBaseDocs, counts minus their own)` at
    * the caller's compaction cadence; the newly-crossed gram set that
    * identifies affected docs is `counts where base_occ < minOcc <=
    * base_occ + batch_occ` — both sides of that predicate are columns of
    * the step-2 join frame. Batch-side output needs none of this: the
    * identity above is exact as-is. */
  def spanDupsIncremental(batch: DataFrame, baseCounts: DataFrame,
      k: Int = 8, minOcc: Int = 2, id: String = "doc_id",
      text: String = "text", hashGrams: Boolean = false,
      broadcastTouched: Boolean = true): DataFrame = {
    val rawGrams = positionalGrams(batch, k, id, text)
    val grams = if (hashGrams)
      rawGrams.select(col(id), col("pos"), xxhash64(col("g")).as("g"))
    else rawGrams
    val dupG = batchGramTotals(grams, baseCounts, broadcastTouched)
      .filter(col("batch_occ") + coalesce(col("base_occ"), lit(0L)) >= minOcc)
      .select("g")
    val dupPos = grams.join(dupG, "g").select(col(id), col("pos"))
    spansFromDupPositions(batch, dupPos, k, id, text)
  }

  /** Per-batch-gram occurrence totals against the persisted base table:
    * (g, batch_occ, base_occ) with base_occ null for grams the base never
    * saw. The shared probe of [[spanDupsIncremental]] and
    * [[crossedGrams]].
    *
    * The probe is the batch count aggregate ITSELF, and batch_occ is
    * surfaced THROUGH the probe side (coalesced with the streamed copy's
    * — equal whenever matched) so column pruning cannot narrow the
    * probe's aggregate to keys-only: with both aggregates byte-identical,
    * AQE stage reuse ships the batch gram shuffle ONCE (plan-pinned); a
    * pruned probe would silently recount the batch behind a second
    * exchange. */
  private def batchGramTotals(grams: DataFrame, baseCounts: DataFrame,
      broadcastTouched: Boolean): DataFrame = {
    val batchCounts = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("batch_occ"))
    val probe =
      if (broadcastTouched) broadcast(batchCounts) else batchCounts
    // inner join: a base gram the batch never mentions contributes no
    // batch position, so only touched grams matter
    val touched = baseCounts
      .select(col("g"), col("occ").as("base_occ"))
      .join(probe, "g")
      .select(col("g"), col("base_occ"), col("batch_occ").as("t_bocc"))
    // touched ⊆ the broadcast probe set by construction, so whenever the
    // probe fit a broadcast the totalling join's build side does too
    val touchedSide = if (broadcastTouched) broadcast(touched) else touched
    batchCounts.join(touchedSide, Seq("g"), "left")
      .select(col("g"),
        coalesce(col("t_bocc"), col("batch_occ")).as("batch_occ"),
        col("base_occ"))
  }

  /** Grams a batch pushes OVER the duplication threshold: present in the
    * base below `minOcc`, at or above it once the batch's occurrences
    * count. These are the compaction-cadence rescan key: base docs whose
    * spans a full recompute would now extend are exactly the docs
    * containing a crossed gram (join their positional grams against this
    * frame — the caller's compaction job; [[spanDupsIncremental]]'s own
    * batch-side output needs none of this). Grams ABSENT from the base
    * are excluded even when the batch alone duplicates them: they match
    * no base doc. Output: (g, base_occ, batch_occ); Θ(batch) cost, same
    * shape as the incremental probe. */
  def crossedGrams(batch: DataFrame, baseCounts: DataFrame, k: Int = 8,
      minOcc: Int = 2, id: String = "doc_id", text: String = "text",
      hashGrams: Boolean = false,
      broadcastTouched: Boolean = true): DataFrame = {
    val rawGrams = positionalGrams(batch, k, id, text)
    val grams = if (hashGrams)
      rawGrams.select(col(id), col("pos"), xxhash64(col("g")).as("g"))
    else rawGrams
    batchGramTotals(grams, baseCounts, broadcastTouched)
      .filter(col("base_occ").isNotNull && col("base_occ") < minOcc &&
        col("batch_occ") + col("base_occ") >= minOcc)
      .select(col("g"), col("base_occ"), col("batch_occ"))
  }

  /** Rewrite step for [[spanDups]]: drop every token covered by a
    * duplicated span and reassemble the text. Output: one row per input
    * doc — (id, n_kept, clean_text). Docs without spans (or without
    * tokens) pass through with their full (possibly empty) token stream
    * reassembled space-separated.
    *
    * Shape at scale (r5 — replaces the r4 token-stream shuffle): the SPAN
    * list (selective by construction — the dups) aggregates to one
    * (starts[], lens[]) range row per covered doc, joins to the corpus on
    * the doc id, and the strip itself is ONE map-side pass through the
    * native [[GraftDespan]] kernel — the corpus token stream is never
    * exploded, shuffled, or reassembled (the r4 shape posexploded every
    * doc ~10× and shuffled the whole token stream by doc_id to
    * collect_list it back — a scale-killer for the one op whose span side
    * is tiny).
    *
    * `broadcastRanges` (default true) hints the range side broadcast.
    * The decision is explicit rather than AQE's because AQE measurably
    * cannot make it here: the range aggregate reuses the span window's
    * doc_id partitioning (and a REPARTITION_BY_COL re-exchange is
    * optimizer-removed as redundant), so no materialized stage boundary
    * sits under the join and AQE keeps the static SMJ — shuffling the
    * corpus. Default-broadcast matches the span side's selectivity; if a
    * boilerplate-heavy corpus outgrows Spark's broadcast limit the job
    * fails LOUDLY and the caller passes false, degrading to one SMJ
    * shuffle of (id, text) rows — still never the exploded token
    * stream. */
  def removeSpans(df: DataFrame, spans: DataFrame, id: String = "doc_id",
      text: String = "text", broadcastRanges: Boolean = true): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    // two collect_lists in ONE aggregate see input rows in the same order,
    // so starts(i) pairs with lens(i); order across ranges is irrelevant
    // (coverage is a union of intervals)
    val ranges = spans.groupBy(col(id))
      .agg(collect_list(col("span_start")).as("starts"),
        collect_list(col("span_len")).as("lens"))
    val side = if (broadcastRanges) broadcast(ranges) else ranges
    val empty = lit(Array.emptyLongArray)
    val r = call_function("graft_despan", coalesce(col(text), lit("")),
      coalesce(col("starts"), empty), coalesce(col("lens"), empty))
    df.join(side, Seq(id), "left")
      .select(col(id), r.as("r"))
      .select(col(id), col("r.n_kept").as("n_kept"),
        col("r.clean_text").as("clean_text"))
  }

  // ---- MinHash + LSH -------------------------------------------------------

  /** Mersenne prime 2^31 - 1 for the universal-hash permutations (THE
    * definition lives with the native kernel, [[GraftMinhash.P]]). */
  val MinhashP: Long = GraftMinhash.P

  /** MinHash signatures: (id, band, bucket) — one row per band, where
    * bucket is a rolling hash of the band's r per-permutation minima.
    * Deterministic in (numHashes, bands); signature size is fixed per doc.
    *
    * Shape at scale: the WHOLE banded signature is one native codegen
    * pass per doc ([[GraftMinhash]] — shingle enumeration, per-shingle
    * fphash, per-permutation minima and band rolling hashes fused into
    * the scan projection), bit-identical to the exploded form it
    * replaces (GraftMinhashSpec pins the equality). ZERO shuffles: the
    * r5 shape exploded one 64-long signature row per shingle and
    * combined them through a typed `groupByKey.reduceGroups` — a full
    * shuffle of the shingle stream that at 100 TB moved the corpus's
    * token volume once per dedup run; now nothing leaves the scan but
    * `bands` longs per doc. */
  def minhashBands(df: DataFrame, numHashes: Int = 64, bands: Int = 16,
      n: Int = 3, id: String = "doc_id", text: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    df.select(col(id).cast("long").as(id),
        posexplode(call_function("graft_minhash_bands", col(text),
          lit(numHashes), lit(bands), lit(n))))
      .select(col(id), col("pos").as("band"), col("col").as("bucket"))
  }

  /** MinHash+LSH near-dup pairs, exact-verified: candidates from band-bucket
    * collisions, then exact Jaccard >= minPct/100 on the shingle sets.
    * Output schema identical to [[jaccardPairs]] — precision 1.0 by
    * construction, recall governed by the (numHashes, bands) curve. */
  def minhashLshPairs(df: DataFrame, numHashes: Int = 64, bands: Int = 16,
      minPct: Int = 80, n: Int = 3, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val bandsDf = minhashBands(df, numHashes, bands, n, id, text)
    val l = bandsDf.select(col("band"), col("bucket"), col(id).as("id_a"))
    val r = bandsDf.select(col("band"), col("bucket"), col(id).as("id_b"))
    val cands = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val sh = shingles(df, n, id, text) // recompute-over-materialize (above)
    val counts = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col(id).as("id_a"), col("shingle"))
    val shB = sh.select(col(id).as("id_b"), col("shingle"))
    val inter = cands.join(shA, "id_a")
      .join(shB, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    sized(inter, counts, id, minPct)
  }

  /** Incremental MinHash+LSH: near-dup pairs TOUCHING an arriving batch,
    * given the persisted band-bucket table of everything indexed before
    * it (`baseBands` = [[minhashBands]] output, stored once and appended
    * per batch — signatures carry no corpus-level state, so per-batch
    * banding composes exactly). Output rows are IDENTICAL to
    * `minhashLshPairs(base ∪ batch).filter(id_a ∈ batch ∨ id_b ∈ batch)`
    * for disjoint id sets — the incremental analog of
    * [[spanDupsIncremental]]'s contract, and the production arrival loop:
    * dedup each batch against the corpus without ever re-hashing it.
    *
    * Shape at scale:
    *  1. batch bands map-side + one Θ(batch) self-join for batch-internal
    *     candidates;
    *  2. cross candidates probe the persisted base table with a BROADCAST
    *     of the batch bands — a pure scan of base bands, zero exchange on
    *     the base side. `broadcastBands=false` degrades to an SMJ for a
    *     batch that outgrows the broadcast limit — shuffling the band
    *     table (24 bytes a row), never the corpus;
    *  3. exact-verify candidates on shingle sets ([[minhashLshPairs]]'s
    *     precision-1 contract): the base corpus is re-read ONLY for docs
    *     in a candidate pair (semi-join pushdown on the id column). */
  def minhashLshPairsIncremental(batch: DataFrame, base: DataFrame,
      baseBands: DataFrame, numHashes: Int = 64, bands: Int = 16,
      minPct: Int = 80, n: Int = 3, id: String = "doc_id",
      text: String = "text", broadcastBands: Boolean = true): DataFrame = {
    val bb = minhashBands(batch, numHashes, bands, n, id, text)
    val probe = if (broadcastBands) broadcast(bb) else bb
    val intra = bb.select(col("band"), col("bucket"), col(id).as("id_a"))
      .join(probe.select(col("band"), col("bucket"), col(id).as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
    val cross = baseBands
      .select(col("band"), col("bucket"), col(id).as("base_id"))
      .join(probe.select(col("band"), col("bucket"),
        col(id).as("batch_id")), Seq("band", "bucket"))
      .select(least(col("base_id"), col("batch_id")).as("id_a"),
        greatest(col("base_id"), col("batch_id")).as("id_b"))
    val cands = intra.select(col("id_a"), col("id_b"))
      .unionByName(cross).distinct()
    // verification corpus: the batch plus ONLY the base docs a candidate
    // names — never the whole base
    val candIds = cands.select(col("id_a").as(id))
      .unionByName(cands.select(col("id_b").as(id))).distinct()
    // candIds broadcasts UNCONDITIONALLY: it is bounded by the candidate
    // PAIR count (the dups a batch actually has), a far smaller regime
    // than the band table the `broadcastBands` flag governs — degrading
    // this semi-join too would shuffle the base corpus (id, text) rows,
    // the one exchange this operator exists to avoid
    val involved = batch.select(col(id), col(text)).unionByName(
      base.select(col(id), col(text))
        .join(broadcast(candIds), Seq(id), "left_semi"))
    val sh = shingles(involved, n, id, text)
    val counts = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val inter = cands.join(sh.select(col(id).as("id_a"), col("shingle")),
        "id_a")
      .join(sh.select(col(id).as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    sized(inter, counts, id, minPct)
  }

  // ---- SimHash --------------------------------------------------------------

  /** Bits in the SimHash signature — 31 so every per-bit term and the
    * assembled signature stay in exact int64 range for any SQL oracle. */
  val SimhashBits: Int = 31

  /** SimHash signatures: (id, simhash) — tf-weighted sign sum per bit of
    * the rolling word hash, assembled into a 31-bit int. Computed entirely
    * MAP-SIDE: the tf-weighted per-word sum Σ_w tf(w)·sign_i(w) equals the
    * plain per-OCCURRENCE sum Σ_tok sign_i(tok), so per doc it is one
    * `transform` (token → hash) plus one `aggregate` per bit over the hash
    * array — zero shuffles (r2 exploded tokens through a (doc, word)
    * groupBy and a second groupBy(doc), two full shuffles of the token
    * stream). Same integer math, same oracle. */
  def simhash(df: DataFrame, id: String = "doc_id",
      text: String = "text", bits: Int = SimhashBits): DataFrame = {
    graft.tokenize.GraftFunctions.register(df.sparkSession)
    // the whole signature is ONE native codegen pass (graft_simhash):
    // bits=31 is bit-identical to the per-bit aggregate-lambda column form
    // it replaces (GraftSimhashSpec pins the equality) and to the SQL
    // oracle; bits=64 is the scale variant (see GraftSimhash doc)
    df
      // docs with zero tokens had no groupBy row in the r2 shape — keep
      // that contract (the oracle groups over exploded tokens). \S ⟺ at
      // least one ws-token, one regex scan with no array allocation (NOT
      // trim()=='': Spark trim strips only U+0020; null text also drops,
      // as with the earlier size(tokens) form)
      .filter(col(text).rlike("\\S"))
      .select(col(id),
        call_function("graft_simhash", col(text), lit(bits)).as("simhash"))
  }

  /** SimHash near-dup pairs: band the signature into 4 chunks (8/8/8/7
    * for 31 bits, 16×4 for 64); docs sharing any chunk are candidates;
    * verified by Hamming distance <= maxHamming. By pigeonhole this is
    * exact for maxHamming <= 3. Use bits=64 beyond ~10k docs: zipfian
    * corpora concentrate 31-bit signatures and the banding floods. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
      id: String = "doc_id", text: String = "text",
      bits: Int = SimhashBits): DataFrame = {
    val sig = simhash(df, id, text, bits) // map-side native hash: recompute
    // unsigned shift + BITMASK (not %) inside simhashBandKeys: Java
    // remainder keeps the dividend's sign, so a 64-bit sig with bit 63
    // set would get a negative band-0 key and never collide with a
    // positive sig sharing the same low chunk — silently breaking the
    // pigeonhole guarantee
    val banded = simhashBandKeys(sig, bits, id)
    // signatures RIDE the band self-join (16 extra bytes a row), so
    // hamming evaluates inside the join projection and the distinct —
    // the only exchange after the join — sees ONLY passing pairs. The
    // r5 shape distinct'ed the full band-collision candidate set and
    // then re-joined the signature table twice; on a zipfian corpus the
    // collision set is the flood (31-bit banding at 5k docs), so
    // filter-before-distinct shrinks that exchange by the rejection
    // rate and drops both verify joins. Same rows out: hamming is a
    // function of the pair, so distinct∘filter ≡ filter∘distinct.
    val l = banded.select(col("chunk"), col("key"), col(id).as("id_a"),
      col("simhash").as("sig_a"))
    val r = banded.select(col("chunk"), col("key"), col(id).as("id_b"),
      col("simhash").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(expr("sig_a ^ sig_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** Band keys of a signature frame: (id, chunk, key, simhash). */
  private def simhashBandKeys(sig: DataFrame, bits: Int,
      id: String): DataFrame = {
    val chunks = if (bits == 64) Seq((0, 16), (16, 16), (32, 16), (48, 16))
                 else Seq((0, 8), (8, 8), (16, 8), (24, 7))
    chunks.zipWithIndex.map { case ((off, len), bi) =>
      sig.select(col(id), lit(bi).as("chunk"),
        shiftrightunsigned(col("simhash"), off)
          .bitwiseAND(lit((1L << len) - 1)).as("key"), col("simhash"))
    }.reduce(_ unionByName _)
  }

  /** Incremental SimHash: near-dup pairs TOUCHING an arriving batch,
    * given the persisted signature table of everything before it
    * ([[simhash]] output, appended per batch — signatures carry no
    * corpus-level state, so per-batch signing composes exactly). Output
    * rows are IDENTICAL to `simhashPairs(base ∪ batch)` restricted to
    * pairs touching the batch, for disjoint id sets — the last member of
    * the incremental dedup family (exact / jaccard / minhash / spans /
    * semdedup all have arrival modes; this closes simhash).
    *
    * Shape at scale: batch signatures map-side (native kernel) + one
    * Θ(batch) band self-join; cross candidates SCAN the base signature
    * table under a broadcast of the batch's band keys (Hamming verifies
    * straight off the probe join's projection — signatures ride along,
    * so no second base lookup); zero base-side exchange.
    * `broadcastSigs=false` degrades to an SMJ of 16-byte signature rows,
    * never the corpus. */
  def simhashPairsIncremental(batch: DataFrame, baseSigs: DataFrame,
      maxHamming: Int = 3, id: String = "doc_id", text: String = "text",
      bits: Int = SimhashBits, broadcastSigs: Boolean = true): DataFrame = {
    val bs = simhash(batch, id, text, bits)
    val bb = simhashBandKeys(bs, bits, id)
    val probe = if (broadcastSigs) broadcast(bb) else bb
    val intra = bb.select(col("chunk"), col("key"), col(id).as("id_a"),
        col("simhash").as("sig_a"))
      .join(probe.select(col("chunk"), col("key"), col(id).as("id_b"),
        col("simhash").as("sig_b")), Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
    val cross = simhashBandKeys(baseSigs, bits, id)
      .select(col("chunk"), col("key"), col(id).as("base_id"),
        col("simhash").as("base_sig"))
      .join(probe.select(col("chunk"), col("key"), col(id).as("batch_id"),
        col("simhash").as("batch_sig")), Seq("chunk", "key"))
      .select(least(col("base_id"), col("batch_id")).as("id_a"),
        greatest(col("base_id"), col("batch_id")).as("id_b"),
        col("base_sig").as("sig_a"), col("batch_sig").as("sig_b"))
    intra.select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .unionByName(cross)
      // hamming BEFORE the distinct (several chunks can collide for one
      // pair): the distinct exchange then carries only passing pairs —
      // the simhashPairs filter-before-distinct move, same rows out
      .withColumn("hamming",
        bit_count(expr("sig_a ^ sig_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }
}
