package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.tokenize.Tokenizer

/** Input row of the posting aggregation. */
final case class PIn(doc_id: Long, tf: Int, dl: Int)

/** One encoded posting part (output of the aggregation). */
final case class PartAgg(first_doc: Long, last_doc: Long, df: Long,
    max_tf: Int, bytes: Array[Byte])

/** Typed aggregator turning a bounded group of (doc_id, tf, dl) rows into one
  * delta+varint block-compressed posting part ([[Codec]]). Group size is
  * bounded by the hot-term salting in [[IndexBuilder]] (each group covers one
  * doc-range cell), so the buffer never exceeds ~conf.maxPostingsPerPart
  * entries — the Spark-native analog of the reference's memory-budgeted
  * LocalIndex flush (reference: app/Indexer/Indexer.cpp:246-250). */
final class PostingAgg(blockSize: Int)
    extends Aggregator[PIn, ArrayBuffer[PIn], PartAgg] {
  override def zero: ArrayBuffer[PIn] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[PIn], a: PIn): ArrayBuffer[PIn] = { b += a; b }
  override def merge(a: ArrayBuffer[PIn], b: ArrayBuffer[PIn]): ArrayBuffer[PIn] = { a ++= b; a }
  override def finish(b: ArrayBuffer[PIn]): PartAgg = {
    if (b.isEmpty) return PartAgg(0L, 0L, 0L, 0, Array.empty)
    val sorted = b.sortBy(_.doc_id)
    var maxTf = 0
    sorted.foreach(p => if (p.tf > maxTf) maxTf = p.tf)
    val bytes = Codec.encode(
      sorted.map(p => Codec.Posting(p.doc_id, p.tf, p.dl)), blockSize)
    PartAgg(sorted.head.doc_id, sorted.last.doc_id, sorted.length.toLong,
      maxTf, bytes)
  }
  override def bufferEncoder = Encoders.kryo[ArrayBuffer[PIn]]
  override def outputEncoder = Encoders.product[PartAgg]
}

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
    buildVersion(spark, corpus, new IndexStore(root), conf, docIdOffset = 0L,
      existingDocs = None)

  /** Core staged build; used by both first build and [[IndexMerger]].
    * @param existingDocs when merging: the previous snapshot's docs table —
    *   re-indexed docs keep their ids, new docs get ids after docIdOffset. */
  private[index] def buildVersion(spark: SparkSession, corpus: Dataset[Turn],
      store: IndexStore, conf: EngineConf, docIdOffset: Long,
      existingDocs: Option[DataFrame]): IndexMeta = {
    import spark.implicits._
    val v = store.nextVersion
    val dir = store.snapshotDir(v)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val done = store.completedStages(v)
    val P = conf.shufflePartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)

    def stage[T](name: String)(f: => Long): Unit =
      if (!done.contains(name)) {
        val t0 = System.nanoTime()
        val rows = f
        store.recordStage(v, name, rows, (System.nanoTime() - t0) / 1000000L)
      }

    // -- stage: docs — dense doc-id assignment in (conv_id, turn_idx) order.
    // RDD zipWithIndex is the one forced RDD use (SURVEY.md §2.3 A1): a dense
    // global ordinal needs per-partition counts + prefix-sum, which is
    // exactly what zipWithIndex does without collecting data to the driver.
    stage("docs") {
      val keys = corpus.select($"conv_id", $"turn_idx")
        .dropDuplicates(Seq("conv_id", "turn_idx"))
      val fresh = existingDocs match {
        case Some(old) => keys.join(old.select($"conv_id", $"turn_idx"),
          Seq("conv_id", "turn_idx"), "left_anti")
        case None => keys
      }
      val sorted = fresh
        .repartitionByRange(P, $"conv_id", $"turn_idx")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .as[(String, Int)]
      val assigned = sorted.rdd.zipWithIndex.map { case ((c, t), i) =>
        DocRow(docIdOffset + i, c, t)
      }
      val docs = existingDocs match {
        case Some(old) => old.as[DocRow].union(spark.createDataset(assigned))
        case None => spark.createDataset(assigned)
      }
      docs.repartitionByRange(P, $"doc_id").sortWithinPartitions($"doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")
      spark.read.parquet(s"$dir/docs").count()
    }
    val docs = spark.read.parquet(s"$dir/docs")

    // -- stage: tokens — tokenize + attach doc ids; materialized once so
    // doc_stats and postings don't re-tokenize the corpus.
    stage("tokens") {
      val toks = tokenize(corpus)
      toks.join(docs, Seq("conv_id", "turn_idx"))
        .select($"term", $"doc_id", $"tf", $"dl")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/_tokens")
      -1L // row count not worth an extra job here
    }
    val tokens = spark.read.parquet(s"$dir/_tokens")

    // -- stage: doc_stats — word_count = distinct terms (= rows, tf is
    // per-doc pre-aggregated), dl = total tokens; docs with no tokens get 0
    // (the reference's empty-file / .md quirk S6 keeps a path entry with
    // count 0, app/Indexer/Indexer.cpp:119-128).
    stage("doc_stats") {
      val agg = tokens.groupBy($"doc_id")
        .agg(count(lit(1)).cast("int").as("word_count"),
             sum($"tf").cast("int").as("dl"))
      docs.select($"doc_id").join(agg, Seq("doc_id"), "left")
        .na.fill(0, Seq("word_count", "dl"))
        .repartitionByRange(P, $"doc_id").sortWithinPartitions($"doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/doc_stats")
      -1L
    }

    // -- stage: hot_terms — small table of terms whose df exceeds one part;
    // broadcast to salt the posting shuffle (skew, SURVEY.md §7.6.3).
    stage("hot_terms") {
      tokens.groupBy($"term").agg(count(lit(1)).as("df"))
        .filter($"df" > conf.maxPostingsPerPart)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/_hot_terms")
      -1L
    }

    // -- stage: postings — salted groupBy(term, cell) → encoded parts.
    stage("postings") {
      val maxDocId = docs.agg(max($"doc_id")).as[Long].head()
      val hot: Map[String, Int] = spark.read.parquet(s"$dir/_hot_terms")
        .as[(String, Long)].collect()
        .map { case (t, df) =>
          t -> math.ceil(df.toDouble / conf.maxPostingsPerPart).toInt }
        .toMap
      val parts = encodeParts(spark, tokens, maxDocId + 1, hot, conf)
      writeParts(parts, s"$dir/postings", P)
      -1L
    }

    // -- stage: dict — the words.index analog; letter partitions + parquet
    // min/max stats replace the words_f jump table (SURVEY.md §4.1).
    stage("dict") {
      val postings = spark.read.parquet(s"$dir/postings")
      postings.groupBy($"letter", $"term")
        .agg(sum($"df").as("df"), count(lit(1)).cast("int").as("parts"))
        .repartitionByRange(math.max(1, P / 4), $"term")
        .sortWithinPartitions($"term")
        .write.mode(SaveMode.Overwrite).partitionBy("letter")
        .parquet(s"$dir/dict")
      -1L
    }

    // -- stage: meta + commit.
    val stats = spark.read.parquet(s"$dir/doc_stats")
    val (numDocs, totalTokens, maxId) = stats
      .agg(count(lit(1)), sum($"dl"), max($"doc_id"))
      .as[(Long, Long, Long)].head()
    val numTerms = spark.read.parquet(s"$dir/dict")
      .select($"term").distinct().count()
    val meta = IndexMeta(v, numDocs, maxId, totalTokens,
      if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs,
      numTerms, conf.k1, conf.b, conf.blockSize)
    store.writeMeta(v, meta)
    store.recordStage(v, "meta", numDocs, 0L,
      Map("numTerms" -> numTerms, "avgdl" -> meta.avgdl))
    // drop the intermediate tokens spill before committing
    deleteRecursive(java.nio.file.Paths.get(s"$dir/_tokens"))
    deleteRecursive(java.nio.file.Paths.get(s"$dir/_hot_terms"))
    store.commit(v)
    meta
  }

  /** Salted posting-part encoding: groupBy(term, doc-range cell) where hot
    * terms (df above one part) are split across `nCells` doc-range cells —
    * every aggregation group is bounded (hot-term skew, SURVEY.md §7.6.3). */
  private[index] def encodeParts(spark: SparkSession, tokens: DataFrame,
      span: Long, hot: Map[String, Int], conf: EngineConf): DataFrame = {
    import spark.implicits._
    val hotB = spark.sparkContext.broadcast(hot)
    val cellOf = udf { (term: String, docId: Long) =>
      val n = hotB.value.getOrElse(term, 1)
      if (n <= 1) 0
      else {
        val width = math.max(1L, (span + n - 1) / n)
        (docId / width).toInt
      }
    }
    val pagg = udaf(new PostingAgg(conf.blockSize), Encoders.product[PIn])
    tokens
      .groupBy($"term", cellOf($"term", $"doc_id").as("cell"))
      .agg(pagg($"doc_id", $"tf", $"dl").as("p"))
      .withColumn("part",
        (row_number().over(Window.partitionBy($"term").orderBy($"cell")) - 1))
      .select(substring($"term", 1, 1).as("letter"), $"term", $"part",
        $"p.first_doc".as("first_doc"), $"p.last_doc".as("last_doc"),
        $"p.df".as("df"), $"p.max_tf".as("max_tf"), $"p.bytes".as("bytes"))
  }

  /** Range-partition by term and write letter-partitioned, term-sorted —
    * parquet min/max stats on `term` per file give the jump-table pruning. */
  private[index] def writeParts(parts: DataFrame, path: String, p: Int): Unit = {
    val spark = parts.sparkSession
    import spark.implicits._
    parts.repartitionByRange(p, $"term", $"part")
      .sortWithinPartitions($"term", $"part")
      .write.mode(SaveMode.Overwrite).partitionBy("letter")
      .parquet(path)
  }

  private[index] def deleteRecursive(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
