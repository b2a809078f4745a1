package graft.app

import org.apache.spark.sql.SparkSession

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.EngineConf
import graft.search.Searcher

/** CLI entry points (the analog of the reference's `app -i` / `app "query"`
  * modes, reference: app/main.cpp:42-159). */
object Mains {
  def session(appName: String, cpus: String =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Build (no snapshot yet) or merge `corpus` into `indexDir`, then
    * promote the mtime watermark (S4) on the NEW snapshot: max(ts, previous
    * watermark). An EMPTY corpus has no max ts (and a no-op merge commits
    * no new version) — nothing is written, no NPE (r3 review finding).
    * Returns the meta and the watermark now in effect. */
  private[graft] def indexAndPromote(spark: SparkSession, store: IndexStore,
      corpus: org.apache.spark.sql.Dataset[graft.model.Turn],
      indexDir: String, conf: EngineConf)
      : (graft.index.IndexMeta, Option[java.sql.Timestamp]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val prevV = store.currentVersion
    val meta =
      if (prevV.isEmpty) IndexBuilder.build(spark, corpus, indexDir, conf)
      else graft.index.IndexMerger.merge(spark, corpus, indexDir, conf)
    if (prevV.contains(meta.version)) // no-op merge: nothing indexed
      (meta, store.watermark(meta.version))
    else {
      val maxTs = corpus.agg(max($"ts"))
        .as[Option[java.sql.Timestamp]].head()
      val prev = store.watermark(meta.version - 1)
      val promoted = (prev, maxTs) match {
        case (Some(p), Some(t)) => Some(if (p.after(t)) p else t)
        case (p, t) => t.orElse(p)
      }
      promoted.foreach(store.writeWatermark(meta.version, _))
      // LSM layer bound, batch mirror of StreamingIndexer's auto-squash:
      // a long chain of CLI merges must not grow per-search layer unions
      // without bound. The squash is result-identical; the watermark rides
      // along to the compacted snapshot (compaction indexes nothing, so
      // the incremental-scan cursor must survive it).
      if (store.layers(meta.version).length >= conf.maxLayers) {
        val squashed = graft.index.Compactor.compact(spark, indexDir, conf)
        promoted.foreach(store.writeWatermark(squashed.version, _))
        (squashed, promoted)
      } else (meta, promoted)
    }
  }

  /** The reference's result listing (one format, every CLI). */
  private[graft] def printResults(rows: Array[org.apache.spark.sql.Row],
      ms: Double): Unit = {
    println(s"\nSearch Results (${rows.length}, ${f"$ms%.0f"} ms):")
    rows.zipWithIndex.foreach { case (r, i) =>
      println(s" $i. ${r.get(0)}:${r.get(1)} -> ${r.get(2)}")
    }
  }
}

/** Build (or incrementally merge into) an index.
  *
  * `--updated-only` is the reference's `config_updated_files_only` (S4,
  * app/Indexer/Indexer.cpp:185-206): only turns with `ts` past the current
  * snapshot's watermark are indexed; the watermark is promoted to the max
  * `ts` actually indexed after a successful commit.
  *
  * Sources: a parquet dir of Turn rows, `gen:<nConvs>` (the deterministic
  * synthetic corpus), or `fs:<dir>` — the reference's own input, a
  * directory tree of .txt/.md files ([[graft.sources.FileCorpus]];
  * `--updated-only` then reproduces the reference's mtime incremental scan).
  *
  * `--config=<file>` reads the reference's `key=value` config.txt
  * ([[ConfigFile]]): `index_path` and `config_path_to_scan` stand in for the
  * positional args (CLI positionals override), `config_updated_files_only`
  * (reference default TRUE) drives the watermark scan,
  * `config_scan_dot_paths` the hidden-path filter, `config_threads_to_use`
  * the local parallelism — so `BuildIndexMain --config=config.txt` behaves
  * like the reference binary pointed at the same file.
  *
  * Usage: BuildIndexMain <indexDir> <corpusParquetDir | gen:<nConvs> | fs:<dir>>
  *        [--updated-only] [--config=<file>] */
object BuildIndexMain {

  /** Fully-resolved build invocation (CLI positionals over config values
    * over reference defaults). */
  final case class Resolved(indexDir: String, src: String,
      updatedOnly: Boolean, engineConf: EngineConf, cpus: String,
      includeHidden: Boolean, logLevel: Option[String])

  /** Pure arg + config resolution — testable without a SparkSession.
    * Left = usage error (the reference's validate(): index_path +
    * path_to_scan must come from the CLI or the config file,
    * Config.cpp:53-60). */
  def resolve(args: Array[String], envCpus: String): Either[String, Resolved] = {
    val cfg = ConfigFile.fromArgs(args)
    val pos = args.filterNot(_.startsWith("--"))
    val indexDirOpt = pos.headOption
      .orElse(cfg.map(_("index_path")).filter(_.nonEmpty))
    val srcOpt = pos.lift(1).orElse(
      cfg.map(_("config_path_to_scan")).filter(_.nonEmpty).map("fs:" + _))
    (indexDirOpt, srcOpt) match {
      case (Some(indexDir), Some(src)) => Right(Resolved(
        indexDir, src,
        updatedOnly = args.contains("--updated-only") ||
          cfg.exists(ConfigFile.bool(_, "config_updated_files_only")),
        engineConf = cfg.map(ConfigFile.engineConf)
          .getOrElse(EngineConf.default),
        cpus = cfg.map(c => ConfigFile.int(c, "config_threads_to_use").toString)
          .getOrElse(envCpus),
        includeHidden = cfg.exists(ConfigFile.bool(_, "config_scan_dot_paths")),
        logLevel = cfg.map(ConfigFile.logLevel)))
      case _ => Left(
        "usage: BuildIndexMain <indexDir> <corpusParquet|gen:N|fs:dir> " +
          "[--updated-only] [--config=<file>]")
    }
  }

  def main(args: Array[String]): Unit = {
    val r = resolve(args, sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")) match {
      case Left(usage) => System.err.println(usage); sys.exit(2); return
      case Right(r) => r
    }
    val (indexDir, src) = (r.indexDir, r.src)
    val updatedOnly = r.updatedOnly
    val engineConf = r.engineConf
    val spark = Mains.session("graft-build", r.cpus)
    r.logLevel.foreach(spark.sparkContext.setLogLevel)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val full =
      if (src.startsWith("gen:"))
        TranscriptGen.dataset(spark, src.stripPrefix("gen:").toLong,
          partitions = spark.sparkContext.defaultParallelism)
      else if (src.startsWith("fs:"))
        graft.sources.FileCorpus.read(spark, src.stripPrefix("fs:"),
          includeHidden = r.includeHidden)
      else spark.read.parquet(src).as[graft.model.Turn]
    val store = new IndexStore(indexDir)
    val wm = if (updatedOnly) store.currentWatermark else None
    val corpus = wm match {
      case Some(t) => full.filter(col("ts") > t)
      case None => full
    }
    if (updatedOnly && corpus.isEmpty) {
      println(s"nothing newer than watermark ${wm.orNull}; index unchanged")
      spark.stop(); return
    }
    val (meta, promoted) =
      Mains.indexAndPromote(spark, store, corpus, indexDir, engineConf)
    println(s"built snapshot v${meta.version}: docs=${meta.numDocs} " +
      s"terms=${meta.numTerms} avgdl=${f"${meta.avgdl}%.3f"} " +
      s"watermark=${promoted.orNull}")
    spark.stop()
  }
}

/** Compact a snapshot: squash merge layers into one (bounds layered-read
  * amplification); with a corpus argument, also apply the fix extension —
  * rebuild the postings of docs present in the corpus from their current
  * text, dropping the stale postings additive merges keep (SURVEY.md §4.2).
  *
  * `--gc` afterwards reclaims snapshot versions the compacted CURRENT no
  * longer references (Iceberg snapshot-expiration analog).
  *
  * Usage: CompactIndexMain <indexDir> [corpusParquetDir | gen:<nConvs>] [--gc] */
object CompactIndexMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: CompactIndexMain <indexDir> [corpusParquet|gen:N]")
      sys.exit(2)
    }
    val spark = Mains.session("graft-compact")
    import spark.implicits._
    val store = new IndexStore(args(0))
    if (store.currentVersion.isEmpty) {
      System.err.println(s"no index snapshot at ${args(0)}")
      spark.stop(); sys.exit(1)
    }
    val fix = args.drop(1).filterNot(_.startsWith("--")).headOption.map { src =>
      if (src.startsWith("gen:"))
        TranscriptGen.dataset(spark, src.stripPrefix("gen:").toLong,
          partitions = spark.sparkContext.defaultParallelism)
      else spark.read.parquet(src).as[graft.model.Turn]
    }
    val nLayers = store.layers(store.currentVersion.get).length
    val meta = graft.index.Compactor.compact(spark, args(0), fix = fix)
    val gced =
      if (args.contains("--gc")) store.gc() else Seq.empty
    println(s"compacted $nLayers layer(s) into snapshot v${meta.version}: " +
      s"docs=${meta.numDocs} terms=${meta.numTerms} " +
      s"fix=${fix.nonEmpty}" +
      (if (gced.nonEmpty) s" gc=[${gced.map(v => s"v$v").mkString(",")}]"
       else ""))
    spark.stop()
  }
}

/** Tombstone documents out of an index ([[graft.index.IndexDeleter]] — the
  * LSM delete the reference lacks): deleted docs stop matching immediately,
  * collection stats stay as-of the snapshot until `CompactIndexMain` purges
  * (the Lucene live-docs contract); re-indexing a deleted key resurrects it.
  *
  * Keys: `<conv_id>` deletes the whole conversation, `<conv_id>:<turn_idx>`
  * one turn. Matching nothing is a no-op (the snapshot stays).
  *
  * Usage: DeleteDocsMain <indexDir> <conv_id>[:turn_idx] ... */
object DeleteDocsMain {
  /** Pure key parsing — testable without a SparkSession. A trailing
    * `:<digits>` is a turn index; any other `:` stays conversation text. */
  private[graft] def parseKey(s: String): (String, Option[Int]) =
    s.lastIndexOf(':') match {
      case -1 => (s, None)
      case i =>
        val tail = s.substring(i + 1)
        if (tail.nonEmpty && tail.forall(_.isDigit) && tail.length <= 9)
          (s.substring(0, i), Some(tail.toInt))
        else (s, None)
    }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: DeleteDocsMain <indexDir> <conv_id>[:turn_idx] ...")
      sys.exit(2)
    }
    val spark = Mains.session("graft-delete")
    import spark.implicits._
    val store = new IndexStore(args(0))
    if (store.currentVersion.isEmpty) {
      System.err.println(s"no index snapshot at ${args(0)}")
      spark.stop(); sys.exit(1)
    }
    val keys = spark.createDataset(args.drop(1).toSeq.map(parseKey))
      .select($"_1".as("conv_id"),
        $"_2".cast("int").as("turn_idx")) // null = whole conversation
    val (meta, n) = graft.index.IndexDeleter.delete(spark, args(0), keys)
    println(s"tombstoned $n doc(s); snapshot v${meta.version} " +
      s"(stats recompute at next compaction)")
    spark.stop()
  }
}

/** Structural integrity check (the reference's `app --check`,
  * app/main.cpp:118-122). Exit 0 iff healthy; prints per-check violations.
  *
  * Usage: CheckIndexMain <indexDir> */
object CheckIndexMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: CheckIndexMain <indexDir>"); sys.exit(2)
    }
    val spark = Mains.session("graft-check")
    val store = new IndexStore(args(0))
    if (store.currentVersion.isEmpty) {
      System.err.println(s"no index snapshot at ${args(0)}")
      spark.stop(); sys.exit(1)
    }
    val rows = graft.verify.IndexCheck.run(spark, store).collect()
    rows.foreach(r => println(f"${r.getString(0)}%-32s ${r.getLong(1)}"))
    val bad = rows.map(_.getLong(1)).sum
    println(if (bad == 0) "index check: OK" else s"index check: $bad violations")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}

/** Search an index — one-shot, or the interactive loop the reference runs
  * (Q10, reference: app/main.cpp:128-141: read queries until `q`/`quit`/
  * `exit`). The interactive mode reuses ONE SparkSession + Searcher across
  * queries, so repeat queries run at warm-plan latency instead of paying
  * the session launch per query.
  *
  * Config flags are the reference's C4 knobs (app/Config/Config.cpp:24,
  * app/CliParser/CliParser.cpp:12-41): `--exact` = config_exact_match
  * (every query term matches exactly, no prefix expansion), `--min-char=N`
  * = config_min_char_for_match (wildcard terms shorter than or equal to N
  * match nothing).
  *
  * `--config=<file>` reads the reference's config.txt ([[ConfigFile]]):
  * `config_exact_match` / `config_min_char_for_match` feed the search conf
  * (CLI flags override, reference Config.cpp:94-97), and `index_path` can
  * stand in for the positional index dir.
  *
  * `--as-of=V` pins every query to committed snapshot version V —
  * point-in-time search over the LSM store (see [[Searcher]]).
  *
  * Usage: SearchMain <indexDir> <query | -i> [--mode=count|countp|bm25|bm25p|batch|batch-bm25|phrase|phrase-bm25|near|nearall|fuzzy|fuzzy-bm25|conv|mlt|snippet|suggest|spell|regex|related|facets|explain|stats|percolate]
  *        [--k=10] [--dist=3] [--ordered] [--edits=1] [--terms=5] [--width=5] [--facet=<col>] [--syn=w:s1,s2;w2:s3] [--as-of=V] [--exact] [--min-char=N] [--config=<file>]
  *        (conv: rollup of count hits by conversation, prints
  *         conv:n_turns -> total_cnt; mlt: query is <convId>[:turnIdx],
  *         needs --corpus=, --terms picks the tf-idf seed terms)
  *        [--corpus=<parquet|gen:N|fs:dir>   (phrase modes: the index is
  *         positionless, so adjacency confirms against the corpus text)] */
object SearchMain {

  /** Fully-resolved search invocation (CLI flags over config values). */
  final case class Resolved(indexDir: String, query: String, mode: String,
      k: Int, conf: EngineConf, logLevel: Option[String],
      corpus: Option[String] = None, dist: Int = 3, edits: Int = 1,
      terms: Int = 5, width: Int = 5, where: Option[String] = None,
      ordered: Boolean = false, facet: Option[String] = None,
      syn: Option[String] = None, asOf: Option[Int] = None,
      after: Option[(String, Int)] = None, doc: Option[(String, Int)] = None)

  /** `<conv>[<sep><turn>]` → (conv_id, turn_idx) via lastIndexOf, so a
    * conv_id containing the separator stays addressable (give it an
    * explicit `<sep>turn` suffix; only a NUMERIC suffix is claimed as the
    * turn). `strict` (the CLI-flag posture: failing the invocation beats
    * an empty result that reads as "no hits") throws on a non-numeric
    * suffix — a typo'd `--after=conv,4x` is a usage error, not an unknown
    * key; the lenient form (the mlt REPL query, where a throw would kill
    * the session) treats it as a turn-less key. */
  private[graft] def parseDocKey(s: String, sep: Char,
      strict: Boolean = false): (String, Int) = {
    val i = s.lastIndexOf(sep)
    if (i < 0) (s, 0)
    else s.substring(i + 1).toIntOption match {
      case Some(t) => (s.substring(0, i), t)
      case None if strict =>
        throw new NumberFormatException(s"doc key '$s': non-numeric turn")
      case None => (s, 0)
    }
  }

  /** `--syn=w:s1,s2;w2:s3` inline synonym spec → (term, synonym) pairs.
    * Malformed segments (no colon, empty sides) are skipped — the
    * engine's malformed-input tolerance posture. */
  private[graft] def parseSynSpec(spec: String): Seq[(String, String)] =
    spec.split(';').toSeq.flatMap { seg =>
      seg.split(':') match {
        case Array(w, ss) if w.trim.nonEmpty =>
          ss.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
            .map(s => (w.trim.toLowerCase, s.toLowerCase))
        case _ => Nil
      }
    }

  /** Pure arg + config resolution — testable without a SparkSession. */
  def resolve(args: Array[String]): Either[String, Resolved] =
    // a non-numeric value in any numeric flag (--k=abc, --as-of=x) is a
    // usage error, not a stack trace (the PipelineMain hygiene posture)
    try resolveParsed(args)
    catch { case _: NumberFormatException => Left(Usage) }

  private def resolveParsed(args: Array[String]): Either[String, Resolved] = {
    val cfg = ConfigFile.fromArgs(args)
    val pos = args.filterNot(_.startsWith("--"))
    val (indexDirOpt, queryOpt) = pos.toSeq match {
      case Seq(d, q, _*) => (Some(d), Some(q))
      case Seq(q) => (cfg.map(_("index_path")).filter(_.nonEmpty), Some(q))
      case _ => (None, None)
    }
    (indexDirOpt, queryOpt) match {
      case (Some(indexDir), Some(query)) =>
        val base = cfg.map(ConfigFile.engineConf).getOrElse(EngineConf.default)
        Right(Resolved(indexDir, query,
          mode = args.collectFirst { case s if s.startsWith("--mode=") =>
            s.stripPrefix("--mode=") }.getOrElse("count"),
          k = args.collectFirst { case s if s.startsWith("--k=") =>
            s.stripPrefix("--k=").toInt }.getOrElse(10),
          conf = base.copy(
            exactMatch = args.contains("--exact") || base.exactMatch,
            minCharForMatch = args.collectFirst {
              case s if s.startsWith("--min-char=") =>
                s.stripPrefix("--min-char=").toInt
            }.getOrElse(base.minCharForMatch)),
          logLevel = cfg.map(ConfigFile.logLevel),
          corpus = args.collectFirst { case s if s.startsWith("--corpus=") =>
            s.stripPrefix("--corpus=") },
          dist = args.collectFirst { case s if s.startsWith("--dist=") =>
            s.stripPrefix("--dist=").toInt }.getOrElse(3),
          edits = args.collectFirst { case s if s.startsWith("--edits=") =>
            s.stripPrefix("--edits=").toInt }.getOrElse(1),
          terms = args.collectFirst { case s if s.startsWith("--terms=") =>
            s.stripPrefix("--terms=").toInt }.getOrElse(5),
          width = args.collectFirst { case s if s.startsWith("--width=") =>
            s.stripPrefix("--width=").toInt }.getOrElse(5),
          where = args.collectFirst { case s if s.startsWith("--where=") =>
            s.stripPrefix("--where=") },
          ordered = args.contains("--ordered"),
          facet = args.collectFirst { case s if s.startsWith("--facet=") =>
            s.stripPrefix("--facet=") },
          syn = args.collectFirst { case s if s.startsWith("--syn=") =>
            s.stripPrefix("--syn=") },
          asOf = args.collectFirst { case s if s.startsWith("--as-of=") =>
            s.stripPrefix("--as-of=").stripPrefix("v").toInt },
          after = args.collectFirst { case s if s.startsWith("--after=") =>
            parseDocKey(s.stripPrefix("--after="), ',', strict = true) },
          doc = args.collectFirst { case s if s.startsWith("--doc=") =>
            parseDocKey(s.stripPrefix("--doc="), ':', strict = true) }))
          // phrase modes need the corpus at the first query; catching it
          // here fails the INVOCATION instead of killing a warmed REPL
          // mid-session at the user's first prompt
          .filterOrElse(r => !r.mode.startsWith("phrase") &&
              r.mode != "near" && r.mode != "nearall" &&
              r.mode != "countp" && r.mode != "bm25p" &&
              r.mode != "mlt" && r.mode != "snippet" &&
              r.mode != "related" && r.mode != "facets" &&
              r.mode != "percolate" &&
              r.where.isEmpty ||
              r.corpus.nonEmpty,
            "phrase/near/countp/bm25p/mlt/snippet/related/facets/percolate modes and --where need " +
              "--corpus=<parquet|gen:N|fs:dir>")
          // facets needs the facet column name up front — failing the
          // invocation beats an empty result that reads as "no hits"
          .filterOrElse(r => r.mode != "facets" || r.facet.nonEmpty,
            "--mode=facets needs --facet=<metadata column>")
          // --where is implemented for count/bm25 only: rejecting the
          // other modes beats silently returning UNFILTERED results
          .filterOrElse(r => r.where.isEmpty ||
              r.mode == "count" || r.mode == "bm25",
            "--where applies to --mode=count|bm25 only")
          // same posture for --syn: silent non-expansion would be worse
          // than a usage error (it reads as "the synonym has no hits")
          .filterOrElse(r => r.syn.isEmpty ||
              ((r.mode == "count" || r.mode == "bm25") && r.where.isEmpty),
            "--syn applies to --mode=count|bm25 only (without --where)")
          // --after pages the plain BM25 ranking only — silently ignoring
          // it on other modes would read as a broken cursor
          .filterOrElse(r => r.after.isEmpty || (r.mode == "bm25" &&
              r.where.isEmpty && r.syn.isEmpty),
            "--after applies to plain --mode=bm25 only")
          // explain needs the doc to explain, up front
          .filterOrElse(r => r.mode != "explain" || r.doc.nonEmpty,
            "--mode=explain needs --doc=<conv>[:turn]")
      case _ => Left(Usage)
    }
  }

  private val Usage: String = "usage: SearchMain <indexDir> <query|-i> " +
    "[--mode=count|countp|bm25|bm25p|batch|batch-bm25|phrase|phrase-bm25|near|nearall|fuzzy|fuzzy-bm25|conv|mlt|snippet|suggest|spell|regex|related|facets|explain|stats|percolate] " +
    "[--k=10] [--dist=3] [--ordered] [--edits=1] [--terms=5] [--width=5] " +
    "[--facet=<metadata column, --mode=facets>] " +
    "[--syn=<w:s1,s2;w2:s3 inline synonym spec, --mode=count|bm25>] " +
    "[--where=<sqlPredicate over the corpus columns>] " +
    "[--as-of=<snapshot version: point-in-time search>] " +
    "[--after=<conv[,turn] — keyset pagination cursor, --mode=bm25>] " +
    "[--doc=<conv[:turn] — the doc to explain, --mode=explain>] " +
    "[--exact] [--min-char=N] [--config=<file>] " +
    "[--corpus=<parquet|gen:N|fs:dir>]"

  def main(args: Array[String]): Unit = {
    val r = resolve(args) match {
      case Left(usage) => System.err.println(usage); sys.exit(2); return
      case Right(r) => r
    }
    val indexDir = r.indexDir
    val query = r.query
    val mode = r.mode
    val k = r.k
    val conf = r.conf
    val spark = Mains.session("graft-search")
    r.logLevel.foreach(spark.sparkContext.setLogLevel)
    val store = new IndexStore(indexDir)
    if (store.currentVersion.isEmpty) {
      System.err.println(s"no index snapshot at $indexDir")
      spark.stop(); sys.exit(1)
    }
    val searcher =
      try new Searcher(spark, store, conf, asOf = r.asOf)
      catch { // out-of-range / gc'ed --as-of version: clean exit, no trace
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage)
          spark.stop(); sys.exit(1); return
      }

    // phrase modes confirm adjacency against the corpus text (the index is
    // positionless); resolve it once, lazily, so count/bm25 never pay it
    lazy val phraseCorpus: org.apache.spark.sql.Dataset[graft.model.Turn] = {
      import spark.implicits._
      val src = r.corpus.getOrElse {
        System.err.println("phrase modes need --corpus=<parquet|gen:N|fs:dir>")
        searcher.close(); spark.stop(); sys.exit(2)
      }
      if (src.startsWith("gen:"))
        TranscriptGen.dataset(spark, src.stripPrefix("gen:").toLong,
          partitions = spark.sparkContext.defaultParallelism)
      else if (src.startsWith("fs:"))
        graft.sources.FileCorpus.read(spark, src.stripPrefix("fs:"))
      else spark.read.parquet(src).as[graft.model.Turn]
    }

    def runOne(q: String): Unit = {
      val t0 = System.nanoTime()
      lazy val synDf = {
        import spark.implicits._
        parseSynSpec(r.syn.get).toDF("term", "synonym")
      }
      val rows = mode match {
        case "count" if r.where.nonEmpty =>
          searcher.searchCountWhere(phraseCorpus.toDF(), q,
            r.where.get).collect()
        case "bm25" if r.where.nonEmpty =>
          searcher.searchBm25Where(phraseCorpus.toDF(), q,
            r.where.get, k).collect()
        case "count" if r.syn.nonEmpty =>
          searcher.searchCountSynonyms(synDf, q).collect()
        case "bm25" if r.syn.nonEmpty =>
          searcher.searchBm25Synonyms(synDf, q, k).collect()
        case "bm25" if r.after.nonEmpty =>
          searcher.searchBm25Page(q, k, r.after).collect()
        case "bm25" => searcher.searchBm25(q, k).collect()
        case "phrase" => searcher.searchPhrase(phraseCorpus, q).collect()
        case "phrase-bm25" =>
          searcher.searchPhraseBm25(phraseCorpus, q, k).collect()
        case "near" =>
          searcher.searchNear(phraseCorpus, q, r.dist, r.ordered).collect()
        case "nearall" =>
          searcher.searchNearAll(phraseCorpus, q, r.dist).collect()
        case "countp" =>
          searcher.searchCountWithPhrases(phraseCorpus, q).collect()
        case "bm25p" =>
          searcher.searchBm25WithPhrases(phraseCorpus, q, k).collect()
        case "fuzzy" => searcher.searchFuzzy(q, r.edits).collect()
        case "fuzzy-bm25" =>
          searcher.searchFuzzyBm25(q, k, r.edits).collect()
        case "conv" => searcher.searchConvTopK(q, k)
          .select("conv_id", "n_turns", "total_cnt").collect()
        case "snippet" =>
          searcher.searchSnippets(phraseCorpus, q, r.width, k)
            .select("conv_id", "turn_idx", "snippet").collect()
        case "suggest" =>
          // (term, "df", df): reuse the a:b -> v result printer
          searcher.suggest(q, k)
            .select(org.apache.spark.sql.functions.col("term"),
              org.apache.spark.sql.functions.lit("df"),
              org.apache.spark.sql.functions.col("df")).collect()
        case "spell" =>
          // "did you mean": (term, "df", df) via the a:b -> v printer
          searcher.didYouMean(q, k)
            .select(org.apache.spark.sql.functions.col("term"),
              org.apache.spark.sql.functions.lit("df"),
              org.apache.spark.sql.functions.col("df")).collect()
        case "batch" =>
          // query = "q1;q2;…": N queries, ONE index pass; rows print as
          // <query_id>#<conv_id>:<turn> -> cnt via the a:b -> v printer
          import org.apache.spark.sql.functions.{col, concat, lit}
          searcher.searchCountBatch(
              q.split(';').toSeq.map(_.trim).filter(_.nonEmpty))
            .select(concat(col("query_id"), lit("#"), col("conv_id")),
              col("turn_idx"), col("cnt")).collect()
        case "batch-bm25" =>
          // the scoring sibling: per-query top-k from one shared frame
          import org.apache.spark.sql.functions.{col, concat, lit}
          searcher.searchBm25Batch(
              q.split(';').toSeq.map(_.trim).filter(_.nonEmpty), k)
            .select(concat(col("query_id"), lit("#"), col("conv_id")),
              col("turn_idx"), col("score")).collect()
        case "explain" =>
          // per-word BM25 breakdown of --doc: word:<tf> -> contribution
          import org.apache.spark.sql.functions.col
          val (dc, dt) = r.doc.get
          searcher.explainScore(q, dc, dt)
            .select(col("word"), col("tf"), col("contribution")).collect()
        case "percolate" =>
          // reverse search over --corpus (the index is not read): query =
          // "q1;q2;…", rows print <conv>:<turn> -> query_id
          import org.apache.spark.sql.functions.col
          graft.search.Percolator.matches(phraseCorpus,
              q.split(';').toSeq.map(_.trim).filter(_.nonEmpty), conf)
            .select(col("conv_id"), col("turn_idx"), col("query_id"))
            .collect()
        case "stats" =>
          // index vocabulary analytics (query ignored): letter:n -> Σdf
          import org.apache.spark.sql.functions.col
          searcher.dictStats()
            .select(col("letter"), col("n_terms"), col("sum_df")).collect()
        case "regex" => searcher.searchRegex(q).collect()
        case "related" =>
          // (term, co_df, pmi): the a:b -> v printer fits
          searcher.relatedTerms(phraseCorpus, q, k).collect()
        case "facets" =>
          // (facet, n_docs, total_cnt): the a:b -> v printer fits
          searcher.searchFacets(phraseCorpus.toDF(), q,
            r.facet.get, k).collect()
        case "mlt" =>
          // query = <convId>[:turnIdx] (same key grammar as --doc)
          val (cid, tix) = parseDocKey(q, ':')
          searcher.moreLikeThis(phraseCorpus, cid, tix, r.terms, k).collect()
        case _ => searcher.searchCount(q).collect()
      }
      Mains.printResults(rows, (System.nanoTime() - t0) / 1e6)
    }

    if (query == "-i") {
      // the reference's REPL loop: prompt, search, repeat until q/quit/exit;
      // pin the dictionary up front (words.index-mmap parity) so repeat
      // queries skip the dict parquet scan
      searcher.warm()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in))
      var line: String = null
      print("query> "); Console.flush()
      while ({ line = in.readLine(); line != null } &&
          !Set("q", "quit", "exit").contains(line.trim)) {
        if (line.trim.nonEmpty) runOne(line.trim)
        print("query> "); Console.flush()
      }
    } else runOne(query)
    searcher.close()
    spark.stop()
  }
}
