package graft.app

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusFilters, Dedup, Similarity, TextStats}

/** CLI for the data-curation layer (`graft.pipeline`) over a parquet
  * documents table — the pipeline analog of the reference-parity mains:
  * every dedup / hygiene / layout operator drivable end to end from the
  * shell, writing parquet or printing a sample.
  *
  * Usage: PipelineMain <op> <docs.parquet|sfDir> [outDir]
  *          [--k=8] [--min-pct=80] [--n=3] [--hash-grams]
  *          [--blocklist=a.com,b.org] [--size=512] [--overlap=64]
  *          [--budget=2048] [--limit=20]
  *
  * Ops: dedup-exact, exact-inc, dedup-jaccard, jaccard-inc, dedup-minhash,
  *      minhash-inc, dedup-simhash, components, survivors, spans,
  *      spans-inc, despan, quality, classifier, lm-score, langid, pii,
  *      repetition, urls, tokens, fingerprint, hashvec, chunk, pack,
  *      ann-brute, ann-pq, semdedup, semdedup-inc.
  *
  * `<docs.parquet|sfDir>`: a parquet path with (doc_id, text) — or a
  * testdata sf directory, in which case `documents.parquet` (and
  * `embeddings.parquet` for the ann ops) inside it are used. Without
  * `outDir` the first `--limit` rows print to stdout; with it the full
  * result writes as parquet.
  */
object PipelineMain {

  private def flag(args: Array[String], name: String): Option[String] =
    args.collectFirst { case s if s.startsWith(s"--$name=") =>
      s.stripPrefix(s"--$name=") }

  /** Numeric flag with the hygiene the strict-validation block promises:
    * `--k=abc` prints the usage message and exits 2 instead of escaping
    * as a raw NumberFormatException. */
  private def numFlag[T](args: Array[String], name: String)(
      parse: String => T): Option[T] =
    flag(args, name).map { v =>
      try parse(v)
      catch {
        case _: NumberFormatException =>
          System.err.println(s"flag --$name needs a numeric value, got: $v")
          System.err.println(Usage)
          sys.exit(2)
      }
    }

  private val KnownFlags = Set("k", "min-pct", "n", "blocklist", "size",
    "overlap", "budget", "limit", "dim")

  private val Usage = "usage: PipelineMain <op> <docs.parquet|sfDir> " +
    "[outDir] [--k=8] [--min-pct=80] [--n=3] [--dim=64] [--hash-grams] " +
    "[--blocklist=a,b] [--size=512] [--overlap=64] [--budget=2048] " +
    "[--limit=20]"

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    // strict arg hygiene: `--k 8` (space form) would otherwise silently
    // become a positional outDir named "8", and a typo'd flag would be
    // silently ignored
    val badFlags = args.filter(_.startsWith("--")).filterNot { f =>
      f == "--hash-grams" ||
        KnownFlags.exists(n => f.startsWith(s"--$n="))
    }
    if (pos.length < 2 || pos.length > 3 || badFlags.nonEmpty) {
      badFlags.foreach(f => System.err.println(
        s"unknown or malformed flag: $f (flags take --name=value)"))
      if (pos.length > 3)
        System.err.println(s"unexpected positional args: " +
          pos.drop(3).mkString(" "))
      System.err.println(Usage)
      sys.exit(2)
    }
    val op = pos(0)
    val inPath = pos(1)
    val outDir = pos.lift(2)
    val k = numFlag(args, "k")(_.toInt).getOrElse(8)
    val minPct = numFlag(args, "min-pct")(_.toInt).getOrElse(80)
    val n = numFlag(args, "n")(_.toInt).getOrElse(3)
    val hashGrams = args.contains("--hash-grams")
    val limit = numFlag(args, "limit")(_.toInt).getOrElse(20)
    // parse EVERY numeric flag before the session exists: numFlag exits 2
    // on garbage, and exiting after session creation would skip the
    // explicit spark.stop() the other error paths take
    val chunkSize = numFlag(args, "size")(_.toInt).getOrElse(512)
    val chunkOverlap = numFlag(args, "overlap")(_.toInt).getOrElse(64)
    val packBudget = numFlag(args, "budget")(_.toLong).getOrElse(2048L)
    val hashDim = numFlag(args, "dim")(_.toInt).getOrElse(64)

    val spark = Mains.session("graft-pipeline")
    val docsPath =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(inPath)) &&
          java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$inPath/documents.parquet")))
        s"$inPath/documents.parquet"
      else inPath
    lazy val docs = spark.read.parquet(docsPath)
    lazy val jaccard = Dedup.jaccardPairs(docs, n = n, minPct = minPct)

    val result: DataFrame = op match {
      case "dedup-exact" => Dedup.exact(docs)
      case "exact-inc" =>
        // same arrival split as the other -inc ops
        Dedup.exactIncremental(docs.filter(col("doc_id") % 7 === 3),
          Dedup.exact(docs.filter(col("doc_id") % 7 =!= 3)))
      case "dedup-jaccard" => jaccard
      case "jaccard-inc" =>
        // same arrival split; the base contributes its persisted shingle
        // set + size tables (the exact-recall incremental member)
        val base = docs.filter(col("doc_id") % 7 =!= 3)
        val baseSets = Dedup.shingleSets(base, n = n)
        Dedup.jaccardPairsIncremental(docs.filter(col("doc_id") % 7 === 3),
          baseSets, baseSizes = Some(Dedup.shingleSetSizes(baseSets)),
          n = n, minPct = minPct)
      case "dedup-minhash" => Dedup.minhashLshPairs(docs, minPct = minPct,
        n = n)
      case "dedup-simhash" => Dedup.simhashPairs(docs, bits = 64)
      case "simhash-inc" =>
        // same arrival split; the base contributes only its persisted
        // signature table (64-bit scale config, like dedup-simhash)
        Dedup.simhashPairsIncremental(docs.filter(col("doc_id") % 7 === 3),
          Dedup.simhash(docs.filter(col("doc_id") % 7 =!= 3), bits = 64),
          bits = 64)
      case "minhash-inc" =>
        // same arrival split as spans-inc: 1/7 of docs are the batch, the
        // rest stand in for the base's persisted band table
        val base = docs.filter(col("doc_id") % 7 =!= 3)
        Dedup.minhashLshPairsIncremental(
          docs.filter(col("doc_id") % 7 === 3), base,
          Dedup.minhashBands(base, numHashes = 64, bands = 16),
          minPct = minPct, n = n)
      case "components" => Dedup.components(jaccard)
      case "survivors" => Dedup.survivors(docs, jaccard)
      case "spans" => Dedup.spanDups(docs, k = k, hashGrams = hashGrams)
      case "spans-inc" =>
        // the catalog's split: 1/7 of docs arrive as the batch, the rest
        // stand in for the already-indexed base's persisted count table
        Dedup.spanDupsIncremental(
          docs.filter(col("doc_id") % 7 === 3),
          Dedup.gramCounts(docs.filter(col("doc_id") % 7 =!= 3), k = k,
            hashGrams = hashGrams),
          k = k, hashGrams = hashGrams)
      case "despan" => Dedup.removeSpans(docs,
        Dedup.spanDups(docs, k = k, hashGrams = hashGrams))
      case "quality" => TextStats.quality(docs)
      case "classifier" =>
        // the catalog's fixed published weights; training is an API-level
        // op (CorpusFilters.trainQualityClassifier) over a labeled frame
        CorpusFilters.classifierScore(docs,
          Array(-2.0, 0.25, 0.45, -3.0, -4.0, 0.05))
      case "lm-score" =>
        // ref = the deterministic 1/10 held-out slice (catalog convention)
        CorpusFilters.lmScore(docs, docs.filter(col("doc_id") % 10 === 0))
      case "langid" => TextStats.langId(docs)
      case "pii" => CorpusFilters.piiRedact(docs)
      case "repetition" => CorpusFilters.repetition(docs)
      case "urls" => CorpusFilters.urlFilter(docs,
        flag(args, "blocklist").map(_.split(",").toSeq).getOrElse(Seq.empty))
      case "tokens" => TextStats.tokenCounts(docs)
      case "fingerprint" => TextStats.fingerprint(docs)
      case "chunk" => TextStats.chunk(docs, chunkSize, chunkOverlap)
      case "pack" => TextStats.packSequences(docs, packBudget)
      case "ann-brute" =>
        val emb = spark.read.parquet(s"$inPath/embeddings.parquet")
        Similarity.bruteForceTopK(emb, emb.limit(5), k = 10)
      case "ann-pq" =>
        val emb = spark.read.parquet(s"$inPath/embeddings.parquet")
        Similarity.pqTopK(emb, emb.limit(5), k = 10)
      case "hashvec" =>
        // the model-free text -> embedding bridge (feature hashing); the
        // id column is renamed to vec_id so the written table feeds the
        // ANN/semdedup ops (which key on vec_id) directly
        TextStats.hashingVectors(docs, dim = hashDim)
          .withColumnRenamed("doc_id", "vec_id")
      case "semdedup" =>
        // --min-pct doubles as the cosine threshold in percent
        val emb = spark.read.parquet(s"$inPath/embeddings.parquet")
        Similarity.semDedup(emb, minCos = minPct / 100.0, nLists = 4)
      case "semdedup-inc" =>
        // same arrival split as the other -inc ops; the base fits the
        // frozen quantizer and contributes its assigned-cell state
        val emb = spark.read.parquet(s"$inPath/embeddings.parquet")
        val base = emb.filter(col("vec_id") % 7 =!= 3)
        val cents = Similarity.fitCentroids(base, nLists = 4)
        Similarity.semDedupIncremental(emb.filter(col("vec_id") % 7 === 3),
          Similarity.assignCells(base, cents), cents,
          minCos = minPct / 100.0)
      case other =>
        System.err.println(s"unknown op: $other")
        spark.stop(); sys.exit(2); return
    }

    outDir match {
      case Some(out) =>
        result.write.mode("overwrite").parquet(out)
        val nRows = spark.read.parquet(out).count()
        println(s"$op: wrote $nRows rows to $out")
      case None =>
        val rows = result.limit(limit).collect()
        println(result.columns.mkString("\t"))
        rows.foreach(r => println(r.toSeq.map {
          case null => "NULL"
          // Row.toSeq yields Seq (never Array) for ArrayType columns
          case a: scala.collection.Seq[_] if a.length > 4 =>
            a.take(4).mkString("[", ",", ",...]")
          case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
          case x => x.toString
        }.mkString("\t")))
        println(s"($op: showing <= $limit rows)")
    }
    spark.stop()
  }
}
