package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.model._

/** One tagged part row entering a posting merge (src 0 = old snapshot wins). */
final case class MIn(first_doc: Long, last_doc: Long, bytes: Array[Byte], src: Int)

/** Wrapper so the merge aggregator output has a Product encoder. */
final case class MOut(parts: Seq[PartAgg])

/** Merge-regroup aggregator: decodes the overlapping old+new parts of one
  * term, unions postings with the reference's additive semantics (a doc
  * already present keeps its old posting — M4 removes already-present doc
  * IDs from the incoming batch, reference: app/Index/Index_Merge.cpp:63-296),
  * then re-splits into bounded parts. */
final class MergePartsAgg(maxPerPart: Int, blockSize: Int)
    extends Aggregator[MIn, ArrayBuffer[MIn], MOut] {
  override def zero: ArrayBuffer[MIn] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[MIn], a: MIn): ArrayBuffer[MIn] = { b += a; b }
  override def merge(a: ArrayBuffer[MIn], b: ArrayBuffer[MIn]): ArrayBuffer[MIn] = { a ++= b; a }
  override def finish(buf: ArrayBuffer[MIn]): MOut = {
    def stream(src: Int): Array[Codec.Posting] =
      buf.filter(_.src == src).sortBy(_.first_doc).toArray
        .flatMap(p => Codec.decodeAll(p.bytes))
    val olds = stream(0); val news = stream(1)
    val out = new ArrayBuffer[Codec.Posting](olds.length + news.length)
    var i = 0; var j = 0
    while (i < olds.length || j < news.length) {
      if (j >= news.length) { out += olds(i); i += 1 }
      else if (i >= olds.length) { out += news(j); j += 1 }
      else if (olds(i).docId < news(j).docId) { out += olds(i); i += 1 }
      else if (olds(i).docId > news(j).docId) { out += news(j); j += 1 }
      else { out += olds(i); i += 1; j += 1 } // old wins (additive semantics)
    }
    MOut(out.grouped(maxPerPart).map { chunk =>
      var maxTf = 0
      chunk.foreach(p => if (p.tf > maxTf) maxTf = p.tf)
      PartAgg(chunk.head.docId, chunk.last.docId, chunk.length.toLong, maxTf,
        Codec.encode(chunk, blockSize))
    }.toSeq)
  }
  override def bufferEncoder = Encoders.kryo[ArrayBuffer[MIn]]
  override def outputEncoder = Encoders.product[MOut]
}

/** Incremental merge: new corpus batch into an existing snapshot — the
  * Spark-first replacement for the reference's in-place WAL merge
  * (reference: app/Index/Index_Merge.cpp:547-1037): instead of planning
  * move/resize/write transactions into mmap'd files, we full-outer-combine
  * the affected posting parts and commit a fresh immutable snapshot.
  *
  * Semantics preserved from the reference (SURVEY.md §7.1.7):
  *   - re-indexed docs keep their ids (M1 path join) and OVERWRITE their
  *     doc_stats (word_count/dl), but stale postings are never deleted;
  *   - on a (term, doc) collision the old posting wins (M4);
  *   - new docs are appended with fresh ids (M2);
  *   - new terms are inserted (M5) — free in the full-outer union.
  */
object IndexMerger {

  def merge(spark: SparkSession, corpus: Dataset[Turn], root: String,
      conf: EngineConf = EngineConf.default): IndexMeta = {
    import spark.implicits._
    val store = new IndexStore(root)
    val oldV = store.currentVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot to merge into at $root"))
    val oldDir = store.snapshotDir(oldV)
    val oldMeta = store.meta(oldV)
    val v = store.nextVersion
    val dir = store.snapshotDir(v)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val done = store.completedStages(v)
    val P = conf.shufflePartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)

    def stage(name: String)(f: => Unit): Unit =
      if (!done.contains(name)) {
        val t0 = System.nanoTime()
        f
        store.recordStage(v, name, -1L, (System.nanoTime() - t0) / 1000000L)
      }

    val oldDocs = spark.read.parquet(s"$oldDir/docs")

    // -- docs: existing keep ids, new appended after old max (M1/M2)
    stage("docs") {
      val keys = corpus.select($"conv_id", $"turn_idx")
        .dropDuplicates(Seq("conv_id", "turn_idx"))
      val fresh = keys.join(oldDocs.select($"conv_id", $"turn_idx"),
        Seq("conv_id", "turn_idx"), "left_anti")
        .repartitionByRange(P, $"conv_id", $"turn_idx")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .as[(String, Int)]
      val offset = oldMeta.maxDocId + 1
      val assigned = spark.createDataset(
        fresh.rdd.zipWithIndex.map { case ((c, t), i) => DocRow(offset + i, c, t) })
      oldDocs.as[DocRow].union(assigned)
        .repartitionByRange(P, $"doc_id").sortWithinPartitions($"doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")
    }
    val docs = spark.read.parquet(s"$dir/docs")

    // -- tokens of the new batch only: resolve doc ids at TURN granularity
    // (one row per turn), then tokenize — the join never carries the ~7x
    // larger exploded token table
    stage("tokens") {
      corpus.select($"conv_id", $"turn_idx", $"text")
        .join(docs, Seq("conv_id", "turn_idx"))
        .select($"doc_id", $"text").as[(Long, String)]
        .flatMap { case (id, text) =>
          val st = graft.tokenize.Tokenizer.stats(text)
          st.tf.iterator.map { case (term, tf) => (term, id, tf, st.dl) }
        }
        .toDF("term", "doc_id", "tf", "dl")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/_tokens")
    }
    val tokens = spark.read.parquet(s"$dir/_tokens")

    // -- doc_stats: new batch overwrites re-indexed docs (M1 count
    // overwrite, Index_Merge.cpp:617-637); untouched docs carried over
    stage("doc_stats") {
      val batchDocs = corpus.select($"conv_id", $"turn_idx")
        .dropDuplicates(Seq("conv_id", "turn_idx"))
        .join(docs, Seq("conv_id", "turn_idx")).select($"doc_id")
      val newStats = batchDocs
        .join(tokens.groupBy($"doc_id")
          .agg(count(lit(1)).cast("int").as("word_count"),
               sum($"tf").cast("int").as("dl")), Seq("doc_id"), "left")
        .na.fill(0, Seq("word_count", "dl"))
      val carried = spark.read.parquet(s"$oldDir/doc_stats")
        .join(batchDocs, Seq("doc_id"), "left_anti")
      carried.unionByName(newStats)
        .repartitionByRange(P, $"doc_id").sortWithinPartitions($"doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/doc_stats")
    }

    // -- segment parts from the new batch
    stage("segment") {
      val span = docs.agg(max($"doc_id")).as[Long].head() + 1
      val hot: Map[String, Int] = tokens.groupBy($"term")
        .agg(count(lit(1)).as("df"))
        .filter($"df" > conf.maxPostingsPerPart)
        .as[(String, Long)].collect()
        .map { case (t, df) =>
          t -> math.ceil(df.toDouble / conf.maxPostingsPerPart).toInt }
        .toMap
      IndexBuilder.writeParts(
        IndexBuilder.encodeParts(spark, tokens, span, hot, conf, P),
        s"$dir/_segment", P)
    }

    // -- postings: combine old snapshot parts with the segment
    stage("postings") {
      val oldP = spark.read.parquet(s"$oldDir/postings")
      val newP = spark.read.parquet(s"$dir/_segment")
      // terms whose new parts reach into the old doc-id space need a
      // dedup regroup; everything else passes through / appends
      val affected = newP.filter($"first_doc" <= oldMeta.maxDocId)
        .select($"term").distinct()
      val oldPass = oldP.join(affected, Seq("term"), "left_anti")
      val newPass = newP.join(affected, Seq("term"), "left_anti")
      val magg = udaf(new MergePartsAgg(conf.maxPostingsPerPart, conf.blockSize),
        Encoders.product[MIn])
      val regrouped = oldP.join(affected, Seq("term"))
        .select($"term", $"first_doc", $"last_doc", $"bytes", lit(0).as("src"))
        .unionByName(newP.join(affected, Seq("term"))
          .select($"term", $"first_doc", $"last_doc", $"bytes", lit(1).as("src")))
        .groupBy($"term")
        .agg(magg($"first_doc", $"last_doc", $"bytes", $"src").as("ps"))
        .select($"term", explode($"ps.parts").as("p"))
        .select(substring($"term", 1, 1).as("letter"), $"term",
          $"p.first_doc".as("first_doc"), $"p.last_doc".as("last_doc"),
          $"p.df".as("df"), $"p.max_tf".as("max_tf"), $"p.bytes".as("bytes"))
      val combined = oldPass.drop("part").unionByName(newPass.drop("part"))
        .unionByName(regrouped)
        .withColumn("part", row_number()
          .over(Window.partitionBy($"term").orderBy($"first_doc")) - 1)
      IndexBuilder.writeParts(combined, s"$dir/postings", P)
    }

    // -- dict + meta + commit (same as first build)
    stage("dict") {
      spark.read.parquet(s"$dir/postings")
        .groupBy($"letter", $"term")
        .agg(sum($"df").as("df"), count(lit(1)).cast("int").as("parts"))
        .repartitionByRange(math.max(1, P / 4), $"term")
        .sortWithinPartitions($"term")
        .write.mode(SaveMode.Overwrite).partitionBy("letter")
        .parquet(s"$dir/dict")
    }

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
      Map("mergedInto" -> s"v$oldV", "numTerms" -> numTerms))
    IndexBuilder.deleteRecursive(java.nio.file.Paths.get(s"$dir/_tokens"))
    IndexBuilder.deleteRecursive(java.nio.file.Paths.get(s"$dir/_segment"))
    store.commit(v)
    meta
  }
}
