package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.tokenize.Tokenizer

/** One encoded posting part (output of the posting encoders). */
final case class PartAgg(first_doc: Long, last_doc: Long, df: Long,
    max_tf: Int, bytes: Array[Byte])

/** Full index build: corpus → docs / doc_stats / postings / dict snapshot.
  *
  * Spark-first re-expression of the reference's tokenize → LocalIndex →
  * combine → serialize pipeline (reference: app/Indexer/Indexer.cpp:161-430,
  * app/Index/Index_Add.cpp): one typed flatMap for tokenization, Catalyst
  * partial+final aggregation instead of manual segment combine, a single
  * term-hash shuffle instead of thread batching, and immutable snapshot
  * commit instead of the WAL.
  *
  * Every stage materializes into the staging snapshot dir and is recorded in
  * manifest.jsonl; a re-run of build() on a partially-written snapshot skips
  * completed stages (checkpoint-resume, north_rule).
  */
object IndexBuilder {

  /** Tokenize into pre-aggregated (per-doc tf) exploded rows. */
  def tokenize(corpus: Dataset[Turn]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.flatMap { t =>
      val st = Tokenizer.stats(t.text)
      st.tf.iterator.map { case (term, tf) =>
        (t.conv_id, t.turn_idx, term, tf, st.dl)
      }
    }.toDF("conv_id", "turn_idx", "term", "tf", "dl")
  }

  def build(spark: SparkSession, corpus: Dataset[Turn], root: String,
      conf: EngineConf = EngineConf.default): IndexMeta =
    buildVersion(spark, corpus, new IndexStore(root), conf)

  /** Core staged first build. */
  private[index] def buildVersion(spark: SparkSession, corpus: Dataset[Turn],
      store: IndexStore, conf: EngineConf): IndexMeta = {
    import spark.implicits._
    val v = store.nextVersion
    val dir = store.snapshotDir(v)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val done = store.completedStages(v)
    val P = conf.shufflePartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)

    // each sequential stage's manifest line carries its shuffle/spill
    // byte deltas and max single-task shuffle read (skew evidence)
    // alongside lineage — IndexStore.instrumentedStage, one definition
    // shared with merge and compaction
    def stage[T](name: String)(f: => Long): Unit =
      store.instrumentedStage(spark, v, name, done)(f)

    // -- stage: prep — ONE range shuffle of the corpus assigns dense doc ids
    // in (conv_id, turn_idx) order and carries the text along, so neither a
    // docs-join nor a second corpus scan is ever needed. RDD zipWithIndex is
    // the one forced RDD use (SURVEY.md §2.3 A1): a dense global ordinal is
    // per-partition counts + prefix-sum, with no driver materialization.
    stage("prep") {
      val sorted = corpus
        .dropDuplicates(Seq("conv_id", "turn_idx"))
        .select($"conv_id", $"turn_idx", $"text")
        .repartitionByRange(P, $"conv_id", $"turn_idx")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .as[(String, Int, String)]
      // word_count (distinct terms) and dl (total tokens) are ROW-LOCAL
      // functions of the text, so they ride along in the same pass — the
      // doc_stats stage becomes a projection. Docs with no kept tokens get
      // 0 (the reference's empty-file / .md quirk S6 keeps a path entry
      // with count 0, app/Indexer/Indexer.cpp:119-128).
      val zipped = sorted.rdd.zipWithIndex().map { case ((c, t, x), i) =>
        val st = Tokenizer.stats(x)
        (i, c, t, x, st.wordCount, st.dl)
      }
      spark.createDataset(zipped)
        .toDF("doc_id", "conv_id", "turn_idx", "text", "word_count", "dl")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/_prep")
      -1L
    }
    val prep = spark.read.parquet(s"$dir/_prep")
    // parquet footer row count (no scan) — shared by the hot-terms skip
    // check and the scale-adaptive shuffle width below
    val prepRows = prep.count()
    // Scale-adaptive width for the batch-proportional stages (guide §2:
    // derive partitioning from input size, never a constant tuned for one
    // mode; §6: small files hurt twice). At bench/cluster scale (≥ ~64k
    // docs) this IS P — the scaling study's postings shuffle is untouched;
    // a small build (the per-catalog fixture indexes, tiny merges) stops
    // paying 32 near-empty sort tasks per stage and writing 32 near-empty
    // files per table that every later query must list and open. Explicit
    // repartitionByRange(N, …) pins N against AQE coalescing, so the
    // adaptivity has to happen here, at plan-build time.
    val pEff = math.min(P, math.max(1, (prepRows / 2000L).toInt))

    // -- stages docs / doc_stats / hot_terms — three INDEPENDENT reads of
    // _prep (two column projections + the sampled skew pre-pass), none of
    // which saturates the executor alone, so their jobs are submitted
    // CONCURRENTLY and their fixed costs (job launch, parquet listing,
    // small writes) overlap. On the 8→32 scaling pair these short stages
    // were ~2.4 s of SERIAL wall at local[32] — pure Amdahl term the
    // postings stage's scaling could never buy back. Stage manifest
    // records stay sequential (recordStage appends a file; the futures
    // only run the Spark work).
    // hot_terms: df estimated from a corpus sample (the AQE-style skew
    // pre-pass, SURVEY.md §7.6.3): only terms near the one-part threshold
    // matter, and for those a few-percent sample puts the cell count
    // within ±1 of exact — harmless either way. No term's df can exceed
    // numDocs: a corpus smaller than half a part cannot produce a hot
    // term, so the sampling job is skipped below that (the encoder's hard
    // run cap bounds memory regardless); prep.count() reads footers only.
    val sampleRate = 0.02
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val bodies: Seq[(String, () => Unit)] = Seq(
        // coalesce(pEff): identity at scale (pEff = P = _prep's partition
        // count), one output file instead of 32 near-empty ones for small
        // builds — these tables are scanned by EVERY later query
        ("docs", () =>
          prep.select($"doc_id", $"conv_id", $"turn_idx").coalesce(pEff)
            .write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")),
        ("doc_stats", () =>
          prep.select($"doc_id", $"word_count", $"dl").coalesce(pEff)
            .write.mode(SaveMode.Overwrite).parquet(s"$dir/doc_stats")),
        ("hot_terms", () =>
          if (prepRows > conf.maxPostingsPerPart / 2)
            prep.select($"text")
              .sample(withReplacement = false, sampleRate, 42L)
              .as[String]
              .flatMap(Tokenizer.tokens(_))
              .groupBy($"value".as("term")).agg(count(lit(1)).as("df_sample"))
              .filter($"df_sample" * (1.0 / sampleRate) >
                conf.maxPostingsPerPart / 2)
              .write.mode(SaveMode.Overwrite).parquet(s"$dir/_hot_terms"))
      ).filterNot { case (name, _) => done.contains(name) }
      val launched = bodies.map { case (name, body) =>
        (name, Future { val t0 = System.nanoTime(); body()
          (System.nanoTime() - t0) / 1000000L })
      }
      // -- stage: postings — tokenize fused into the map side of the one
      // term shuffle (no token materialization round-trip), then salted
      // sort-based streaming encode. Runs CONCURRENTLY with docs/doc_stats
      // (it reads only _prep and _hot_terms, chained after the hot_terms
      // future): the short projection stages used to serialize ~0.3-0.9 s
      // of wall in front of the dominant stage at BOTH scaling levels — a
      // pure Amdahl term (guide §2.6: overlap independent jobs). Its
      // shuffle metrics keep their own tap; the only concurrent shuffle is
      // hot_terms' 2% sample aggregate (noise against the term shuffle,
      // noted here for the skew-evidence reader).
      // maxDocId needs NO job: prep assigns dense ids 0..N-1 by
      // construction (zipWithIndex — the docs_ids_dense invariant
      // IndexCheck asserts), so max = prepRows - 1, and -1 for an empty
      // corpus falls out of the same arithmetic.
      val hotFut = launched.collectFirst { case ("hot_terms", f) => f }
      val postingsFut: Option[Future[(Long, Map[String, Any])]] =
        if (done.contains("postings")) None
        else Some(Future {
          hotFut.foreach(f => Await.result(f, Duration.Inf))
          val tap = new graft.util.TaskMetricsTap
          spark.sparkContext.addSparkListener(tap)
          val t0 = System.nanoTime()
          try {
            val hotPath = java.nio.file.Paths.get(s"$dir/_hot_terms")
            val hotHasData = java.nio.file.Files.isDirectory(hotPath) && {
              import scala.jdk.CollectionConverters._
              java.nio.file.Files.list(hotPath).iterator().asScala
                .exists(_.getFileName.toString.endsWith(".parquet"))
            }
            val hot: Map[String, Int] =
              if (!hotHasData) Map.empty
              else spark.read.parquet(s"$dir/_hot_terms")
                .as[(String, Long)].collect()
                .map { case (t, dfS) =>
                  t -> math.max(1, math.ceil(
                    dfS * (1.0 / sampleRate) / conf.maxPostingsPerPart).toInt) }
                .toMap
            val tokens = prep.select($"doc_id", $"text").as[(Long, String)]
              .flatMap { case (id, text) =>
                val st = Tokenizer.stats(text)
                st.tf.iterator.map { case (term, tf) => (term, id, tf, st.dl) }
              }
              .toDF("term", "doc_id", "tf", "dl")
            val parts = encodeParts(spark, tokens, prepRows, hot, conf, pEff)
            writeParts(parts, s"$dir/postings", pEff)
            val millis = (System.nanoTime() - t0) / 1000000L
            tap.drain()
            (millis, tap.metricsMap)
          } finally spark.sparkContext.removeSparkListener(tap)
        })
      // settle ALL futures before letting a failure unwind: an orphaned
      // sibling job still writing into the snapshot dir would race a
      // same-JVM resume's overwrite of that path
      val settled = launched.map { case (name, fut) =>
        (name, scala.util.Try(Await.result(fut, Duration.Inf))) }
      val postingsSettled = postingsFut.map(f =>
        scala.util.Try(Await.result(f, Duration.Inf)))
      settled.foreach {
        case (name, scala.util.Success(millis)) =>
          store.recordStage(v, name, -1L, millis)
        case _ => () // failed stage: no record — the resume re-runs it
      }
      postingsSettled.foreach {
        case scala.util.Success((millis, metrics)) =>
          store.recordStage(v, "postings", -1L, millis, metrics)
        case _ => ()
      }
      settled.collectFirst { case (_, scala.util.Failure(e)) => throw e }
      postingsSettled.collect { case scala.util.Failure(e) => throw e }
    }

    // -- stage: dict — the words.index analog; letter partitions + parquet
    // min/max stats replace the words_f jump table (SURVEY.md §4.1).
    // An empty corpus writes no posting files; the dict dir then stays
    // fileless too and readers fall back to the typed empty frame.
    stage("dict") { if (IndexStore.dirHasParquet(s"$dir/postings")) {
      val postings = spark.read.parquet(s"$dir/postings")
      postings.groupBy($"letter", $"term")
        .agg(sum($"df").as("df"), count(lit(1)).cast("int").as("parts"))
        .repartitionByRange(math.max(1, pEff / 4), $"term")
        .sortWithinPartitions($"term")
        .write.mode(SaveMode.Overwrite).partitionBy("letter")
        .parquet(s"$dir/dict")
    }; -1L }

    // -- stage: meta + commit (sum/max are null over an empty corpus).
    val stats = spark.read.parquet(s"$dir/doc_stats")
    val (numDocs, totalTokensOpt, maxIdOpt) = stats
      .agg(count(lit(1)), sum($"dl"), max($"doc_id"))
      .as[(Long, Option[Long], Option[Long])].head()
    val (totalTokens, maxId) =
      (totalTokensOpt.getOrElse(0L), maxIdOpt.getOrElse(-1L))
    // dict has exactly one row per term (the letter is a function of the
    // term), so numTerms is the dict's parquet ROW COUNT — served from
    // file footers, replacing a distinct shuffle + full dict scan
    val numTerms =
      if (IndexStore.dirHasParquet(s"$dir/dict"))
        spark.read.parquet(s"$dir/dict").count()
      else 0L
    val meta = IndexMeta(v, numDocs, maxId, totalTokens,
      if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs,
      numTerms, conf.k1, conf.b, conf.blockSize)
    store.writeMeta(v, meta)
    store.writeLayers(v, Seq(TableLayer(v, s"v$v/docs", s"v$v/doc_stats",
      s"v$v/postings", s"v$v/dict", None)))
    store.recordStage(v, "meta", numDocs, 0L,
      Map("numTerms" -> numTerms, "avgdl" -> meta.avgdl))
    store.commit(v)
    // spills are dropped only AFTER the commit point: a crash in between
    // leaves a committed snapshot plus dead temp dirs (harmless), never a
    // manifest that promises stages whose inputs are gone
    deleteRecursive(java.nio.file.Paths.get(s"$dir/_prep"))
    deleteRecursive(java.nio.file.Paths.get(s"$dir/_hot_terms"))
    meta
  }

  /** Salted sort-based posting-part encoding: hash-shuffle by (term,
    * doc-range cell) — hot terms (df above one part) split across `nCells`
    * cells so no single reducer key exceeds ~maxPostingsPerPart postings
    * (skew, SURVEY.md §7.6.3) — then sortWithinPartitions + a streaming
    * per-run encoder. The shuffle moves compact Tungsten rows, the sort is
    * Spark's spillable UnsafeExternalSorter, and the encoder holds one
    * (term, cell) run of primitives at a time: bounded memory at any df —
    * the Spark-native analog of the reference's memory-budgeted LocalIndex
    * flush (reference: app/Indexer/Indexer.cpp:246-250). */
  private[index] def encodeParts(spark: SparkSession, tokens: DataFrame,
      span: Long, hot: Map[String, Int], conf: EngineConf, p: Int): DataFrame = {
    import spark.implicits._
    // cell assignment: constant 0 with NO per-row work when the hot set is
    // empty (the common case — and the whole-stage-codegen path); a
    // broadcast-map UDF lookup only when hot terms exist. The r3 attempt to
    // replace the UDF with a broadcast LEFT JOIN of a (term, ncells) frame
    // REGRESSED the postings stage ~35-80% on the hot-term bench corpus
    // (local[32] 500k-conv build: 15.5s UDF vs 20-28s join, A/B same day,
    // best-of-2 each) — the join's probe on a 50M-row stream costs more
    // than the boxed lookup it saves; measured, reverted.
    val withCell =
      if (hot.isEmpty) tokens.withColumn("cell", lit(0))
      else {
        val hotB = spark.sparkContext.broadcast(hot)
        val cellOf = udf { (term: String, docId: Long) =>
          val n = hotB.value.getOrElse(term, 1)
          if (n <= 1) 0
          else {
            val width = math.max(1L, (span + n - 1) / n)
            (docId / width).toInt
          }
        }
        tokens.withColumn("cell", cellOf($"term", $"doc_id"))
      }
    val blockSize = conf.blockSize
    // range partitioning (not hash) so the sampled key distribution spreads
    // the (term, cell) groups evenly across reducers even when the key
    // space is small; equal keys always land in one partition
    val runs = withCell
      .select($"term", $"cell", $"doc_id", $"tf", $"dl")
      .repartitionByRange(p, $"term", $"cell")
      .sortWithinPartitions($"term", $"cell", $"doc_id")
      .as[(String, Int, Long, Int, Int)]
    val maxPerPart = conf.maxPostingsPerPart
    val encoded = runs.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(String, Int, Int, Long, Long, Long, Int, Array[Byte])] {
        // fixed primitive run buffers: a run is HARD-capped at maxPerPart
        // postings — a hot term the sampling pre-pass missed still encodes
        // as a chain of bounded sequential parts instead of one unbounded
        // in-memory buffer (ADVICE r1; ranges stay disjoint and ordered
        // because the run arrives doc-sorted)
        private val docA = new Array[Long](maxPerPart)
        private val tfA = new Array[Int](maxPerPart)
        private val dlA = new Array[Int](maxPerPart)
        private var curTerm: String = null
        private var curCell = -1
        private var chunk = 0
        def hasNext: Boolean = buf.hasNext
        def next(): (String, Int, Int, Long, Long, Long, Int, Array[Byte]) = {
          val term = buf.head._1
          val cell = buf.head._2
          chunk = if (term == curTerm && cell == curCell) chunk + 1 else 0
          curTerm = term; curCell = cell
          var n = 0
          var maxTf = 0
          while (n < maxPerPart && buf.hasNext &&
              buf.head._1 == term && buf.head._2 == cell) {
            val (_, _, d, tf, dl) = buf.next()
            docA(n) = d; tfA(n) = tf; dlA(n) = dl; n += 1
            if (tf > maxTf) maxTf = tf
          }
          (term, cell, chunk, docA(0), docA(n - 1), n.toLong, maxTf,
            Codec.encodeColumns(docA, tfA, dlA, n, blockSize))
        }
      }
    }.toDF("term", "cell", "chunk", "first_doc", "last_doc", "df", "max_tf",
      "bytes")
    encoded
      .withColumn("part", (row_number().over(
        Window.partitionBy($"term").orderBy($"cell", $"chunk")) - 1))
      .select(substring($"term", 1, 1).as("letter"), $"term", $"part",
        $"first_doc", $"last_doc", $"df", $"max_tf", $"bytes")
  }

  /** Range-partition by term and write letter-partitioned, term-sorted —
    * parquet min/max stats on `term` per file give the jump-table pruning.
    * No explicit partition count: AQE sizes the output by bytes, so a small
    * merge delta coalesces to a few files while a full build still splits
    * wide (explicit N would pin tiny deltas to N near-empty files). */
  private[index] def writeParts(parts: DataFrame, path: String, p: Int): Unit = {
    val spark = parts.sparkSession
    import spark.implicits._
    parts.repartitionByRange($"term", $"part")
      .sortWithinPartitions($"term", $"part")
      .write.mode(SaveMode.Overwrite).partitionBy("letter")
      .parquet(path)
  }

  private[graft] def deleteRecursive(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
