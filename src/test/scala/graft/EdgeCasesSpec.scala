package graft

import java.sql.Timestamp

import graft.index.{IndexBuilder, IndexMerger, IndexStore}
import graft.model.{EngineConf, Turn}
import graft.search.Searcher

/** Degenerate-input hardening: empty corpus, all-separator texts,
  * single-doc builds — the engine must produce a committed, healthy,
  * searchable (if vacuous) snapshot for every one of them. */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64,
    blockSize = 16)
  private def ts(s: Int) = Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
  private def turn(c: String, text: String) =
    Turn(c, 0, "u", text, null, ts(1))

  test("empty corpus builds a committed, healthy, searchable snapshot") {
    val dir = tmpDir("graft-empty")
    val meta = IndexBuilder.build(spark,
      spark.emptyDataset[Turn], dir, conf)
    assert(meta.numDocs == 0 && meta.numTerms == 0 && meta.avgdl == 0.0)
    val store = new IndexStore(dir)
    assert(store.currentVersion.contains(1))
    val s = new Searcher(spark, store, conf)
    assert(s.searchCount("anything").collect().isEmpty)
    assert(s.searchBm25("anything here", 5).collect().isEmpty)
    s.close()
    val checks = graft.verify.IndexCheck.run(spark, store).collect()
    assert(checks.map(_.getLong(1)).sum == 0, "empty index must be healthy")
  }

  test("merge a real batch INTO an empty index") {
    val dir = tmpDir("graft-empty-merge")
    IndexBuilder.build(spark, spark.emptyDataset[Turn], dir, conf)
    val batch = Seq(turn("c1", "zebra wombat searching indexes")).toDS()
    val meta = IndexMerger.merge(spark, batch, dir, conf)
    assert(meta.numDocs == 1 && meta.numTerms == 4)
    val s = new Searcher(spark, new IndexStore(dir), conf)
    assert(s.searchCount("zebra").collect().map(_.getString(0)).toSeq
      == Seq("c1"))
    s.close()
  }

  test("all-separator and null-ish texts keep doc rows with zero tokens") {
    val dir = tmpDir("graft-seps")
    val corpus = Seq(
      turn("c1", "!!! 123 ... ---"), // every char folds to separator
      turn("c2", ""),
      turn("c3", "zebra wombat here")).toDS()
    val meta = IndexBuilder.build(spark, corpus, dir, conf)
    assert(meta.numDocs == 3)
    val store = new IndexStore(dir)
    val stats = store.docStats(spark).join(store.docs(spark), "doc_id")
      .select($"conv_id", $"dl").as[(String, Int)].collect().toMap
    assert(stats("c1") == 0 && stats("c2") == 0 && stats("c3") == 3)
    val checks = graft.verify.IndexCheck.run(spark, store).collect()
    assert(checks.map(_.getLong(1)).sum == 0)
  }

  test("single-doc corpus: BM25 and count agree on the only doc") {
    val dir = tmpDir("graft-single")
    IndexBuilder.build(spark, Seq(turn("only", "zebra zebra wombat")).toDS(),
      dir, conf)
    val s = new Searcher(spark, new IndexStore(dir), conf)
    val cnt = s.searchCount(""""zebra"""").collect()
    assert(cnt.length == 1 && cnt.head.getLong(2) == 1L) // 1 matched word
    val bm = s.searchBm25("zebra", 5).collect()
    assert(bm.length == 1 && bm.head.getString(0) == "only")
    s.close()
  }

  test("components and stratified sample on empty inputs") {
    import org.apache.spark.sql.functions.col
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.pipeline.Dedup.components(emptyPairs).collect().isEmpty)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.pipeline.TextStats.stratifiedSample(
      graft.pipeline.TextStats.langId(emptyDocs), Map("en" -> 10))
      .collect().isEmpty)
  }
}
