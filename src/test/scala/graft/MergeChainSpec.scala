package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{Compactor, IndexBuilder, IndexMerger, IndexStore}
import graft.model.{DocKey, EngineConf, Turn}
import graft.search.Searcher
import graft.verify.{IndexCheck, Oracle}

/** Randomized (seeded) merge-chain hardening: a sequence of batches mixing
  * fresh conversations, re-indexed turns with changed text, and duplicate
  * re-sends, folded through build → merge → COMPACT (mid-chain) → merge →
  * merge → gc, must equal the oracle fed the same sequence. Covers the
  * layered-read paths the fixed two-batch specs don't: merge ONTO a
  * compacted snapshot, repeated re-index of the same doc across layers
  * (replaced-terms masks stacking), and gc safety mid-lifecycle. */
class MergeChainSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 32,
    blockSize = 8)
  private val Base = Timestamp.valueOf("2026-02-01 00:00:00")

  /** Letter-only step markers (digits never tokenize). */
  private val markers = Array("chainalpha", "chainbravo", "chaincharlie",
    "chaindelta")

  /** Batch i: `fresh` new conversations + `rewrites` re-indexed turn-0s
    * with changed text carrying the step marker. Seeded, deterministic. */
  private def batch(i: Int, nextConv: Long, fresh: Int,
      rewriteConvs: Seq[Long]): Seq[Turn] = {
    val news = (nextConv until nextConv + fresh).flatMap(TranscriptGen.genConv)
    val rnd = new scala.util.Random(1000L + i)
    val upd = rewriteConvs.map { c =>
      val extra = Seq("therefore", "sparkle", "indexing", "wouldst")(
        rnd.nextInt(4))
      Turn(TranscriptGen.convId(c), 0, "user",
        s"${markers(i)} fresh contents $extra", null,
        new Timestamp(Base.getTime + (i * 1000L + c) * 1000L))
    }
    news ++ upd
  }

  test("random batch chain with mid-chain compaction equals the oracle") {
    val dir = tmpDir("graft-chain")
    val oracle = new Oracle(conf)

    // step 0: initial build of 20 conversations
    val b0 = TranscriptGen.local(20)
    oracle.indexAll(b0)
    IndexBuilder.build(spark, spark.createDataset(b0).repartition(4), dir,
      conf)

    // step 1: merge — 6 fresh convs + rewrite convs 0, 3 (+ a duplicate
    // re-send of one fresh turn inside the same batch: dedup path)
    val b1 = batch(1, 20, 6, Seq(0L, 3L))
    oracle.indexAll(b1)
    IndexMerger.merge(spark,
      spark.createDataset(b1 ++ b1.take(1)).repartition(3), dir, conf)

    // mid-chain squash (no semantic change for the oracle)
    Compactor.compact(spark, dir, conf)

    // step 2: merge ONTO the compacted snapshot — rewrite conv 0 AGAIN
    // (replaced-terms masks must stack correctly) + 4 fresh convs
    val b2 = batch(2, 26, 4, Seq(0L, 7L))
    oracle.indexAll(b2)
    IndexMerger.merge(spark, spark.createDataset(b2).repartition(2), dir, conf)

    // step 3: pure-append merge
    val b3 = batch(3, 30, 5, Seq.empty)
    oracle.indexAll(b3)
    IndexMerger.merge(spark, spark.createDataset(b3).repartition(2), dir, conf)

    val store = new IndexStore(dir)
    store.gc() // must not break anything the chain still references

    // dictionary identity
    val dict = store.dict(spark).select("term", "df")
      .as[(String, Long)].collect().toMap
    val odict = oracle.postings.view.mapValues(_.size.toLong).toMap
    assert(dict == odict)

    // doc stats identity (overwrite-wins across the whole chain)
    val stats = store.docStats(spark).join(store.docs(spark), "doc_id")
      .collect().map(r => DocKey(r.getAs[String]("conv_id"),
        r.getAs[Int]("turn_idx")) ->
        (r.getAs[Int]("word_count"), r.getAs[Int]("dl"))).toMap
    assert(stats == oracle.docStats.toMap)

    // search parity: step markers, rewritten-away terms, boolean structure
    val searcher = new Searcher(spark, store, conf)
    val queries = Seq("chainalpha", "chainbravo", "which",
      "(which AND would)", "((chainalpha OR chainbravo) AND fresh)",
      "(therefore NOT message)", "contents")
    for (q <- queries) {
      val got = searcher.searchCount(q).collect()
        .map { case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }
        .toMap
      assert(got == oracle.searchCount(q).toMap, s"query: $q")
    }
    val eb = oracle.searchBm25("which contents fresh", 10)
    val gb = searcher.searchBm25("which contents fresh", 10).collect().map {
      case Row(c: String, t: Int, s: Double) => (DocKey(c, t), s) }.toSeq
    assert(gb.map(_._1) == eb.map(_._1))
    gb.zip(eb).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) <= 1e-9 * math.max(1.0, math.abs(es)))
    }

    assert(IndexCheck.healthy(spark, store))
    searcher.close()
  }

  test("batch merge chain auto-squashes at maxLayers and stays exact") {
    // 2×maxLayers batch merges through the CLI path (indexAndPromote):
    // the layer chain must never exceed the bound, the squashes must be
    // result-identical, and the incremental-scan watermark must survive
    // every squash (compaction indexes nothing).
    val dir = tmpDir("graft-autosquash")
    val cfg = conf.copy(maxLayers = 3)
    val oracle = new Oracle(cfg)
    val store = new IndexStore(dir)
    var nextConv = 0L
    var sawSquash = false
    for (step <- 0 to 2 * cfg.maxLayers) {
      val b = (nextConv until nextConv + 3).flatMap(TranscriptGen.genConv)
      nextConv += 3
      oracle.indexAll(b)
      val (meta, wm) = graft.app.Mains.indexAndPromote(spark, store,
        spark.createDataset(b).repartition(2), dir, cfg)
      val nLayers = store.layers(store.currentVersion.get).length
      assert(nLayers <= cfg.maxLayers,
        s"step $step: $nLayers layers exceeds bound ${cfg.maxLayers}")
      if (nLayers == 1 && step > 0) sawSquash = true
      // the watermark must be present on whatever snapshot is CURRENT —
      // including one produced by an auto-squash
      assert(wm.isDefined && store.watermark(meta.version) == wm,
        s"step $step lost the watermark")
    }
    assert(sawSquash, "chain never squashed — bound untested")

    val dict = store.dict(spark).select("term", "df")
      .as[(String, Long)].collect().toMap
    assert(dict == oracle.postings.view.mapValues(_.size.toLong).toMap)
    val searcher = new Searcher(spark, store, cfg)
    for (q <- Seq("which", "(which AND would)", "contents")) {
      val got = searcher.searchCount(q).collect()
        .map { case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }
        .toMap
      assert(got == oracle.searchCount(q).toMap, s"query: $q")
    }
    assert(IndexCheck.healthy(spark, store))
    searcher.close()
  }
}
