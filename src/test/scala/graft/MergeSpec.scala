package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{IndexMerger, IndexBuilder, IndexStore}
import graft.model.{DocKey, EngineConf}
import graft.search.Searcher
import graft.verify.Oracle

/** Incremental-merge parity: batch1 build + batch2 merge must equal the
  * oracle fed the same sequence — including the reference's additive
  * semantics (stale postings survive re-index; doc_stats overwritten;
  * old posting wins a (term,doc) collision). SURVEY.md §7.1.7. */
class MergeSpec extends SparkTestBase {

  private val N = 60L
  private val Extra = 15L
  private val Overlap = 10
  private val conf = EngineConf.default.copy(maxPostingsPerPart = 48, blockSize = 8)

  private lazy val batch1 = TranscriptGen.local(N.toInt)
  private lazy val batch2 = TranscriptGen.batch2(N, Extra, Overlap)

  private lazy val oracle = {
    val o = new Oracle(conf)
    o.indexAll(batch1)
    o.indexAll(batch2)
    o
  }

  private lazy val indexDir: String = {
    val dir = tmpDir("graft-merge-idx")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, N, partitions = 4), dir, conf)
    IndexMerger.merge(spark,
      TranscriptGen.batch2Dataset(spark, N, Extra, Overlap), dir, conf)
    dir
  }

  private lazy val store = new IndexStore(indexDir)
  private lazy val searcher = new Searcher(spark, store, conf)

  test("snapshot versioning: v1 then v2, CURRENT points at v2") {
    val _ = indexDir
    assert(store.currentVersion.contains(2))
  }

  test("merged meta matches oracle (docs, avgdl, terms)") {
    val _ = indexDir
    val meta = store.currentMeta
    assert(meta.numDocs == oracle.numDocs)
    assert(math.abs(meta.avgdl - oracle.avgdl) < 1e-9)
    assert(meta.numTerms == oracle.postings.size)
  }

  test("re-indexed docs keep ids; new docs appended after old max") {
    val _ = indexDir
    val docs = store.docs(spark).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("conv_id"),
        r.getAs[Int]("turn_idx")))
    assert(docs.map(_._1).distinct.length == docs.length)
    // ids are dense 0..n-1
    assert(docs.map(_._1).sorted.toSeq == (0L until docs.length.toLong))
    // doc ids assigned in batch order: all batch-1 docs sort before appended
    val batch1Keys = batch1.map(t => (t.conv_id, t.turn_idx)).toSet
    val oldIds = docs.filter(d => batch1Keys.contains((d._2, d._3))).map(_._1)
    val newIds = docs.filterNot(d => batch1Keys.contains((d._2, d._3))).map(_._1)
    assert(newIds.isEmpty || oldIds.max < newIds.min)
  }

  test("additive semantics: stale postings survive re-index") {
    val _ = indexDir
    // conv 0 turn 0 was rewritten in batch2; its ORIGINAL terms must still
    // match it (the reference never deletes postings)
    val origTerms = new Oracle(conf).indexAll(batch1)
      .postings.keys.filter { t =>
        new Oracle(conf).indexAll(batch1).postings(t)
          .contains(DocKey(TranscriptGen.convId(0), 0))
      }
    val probe = origTerms.find(t => t.length > 4 && t != "rewritten")
    assert(probe.nonEmpty)
    val got = searcher.searchCount(probe.get).collect()
      .map { case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }.toMap
    val expected = oracle.searchCount(probe.get).toMap
    assert(got == expected)
    assert(got.contains(DocKey(TranscriptGen.convId(0), 0)),
      s"stale posting for '${probe.get}' must survive")
  }

  test("count-parity and BM25 rank-identity after merge (query set)") {
    val _ = indexDir
    val queries = Seq("which", "(which AND would)", "rewritten",
      "appended", "\"people\"", "((which OR would) AND there)",
      "(therefore NOT message)")
    for (q <- queries) {
      val expected = oracle.searchCount(q).toMap
      val got = searcher.searchCount(q).collect()
        .map { case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }.toMap
      assert(got == expected, s"count query: $q")
      val eb = oracle.searchBm25(q, 10)
      val gb = searcher.searchBm25(q, 10).collect().map {
        case Row(c: String, t: Int, s: Double) => (DocKey(c, t), s) }.toSeq
      assert(gb.length == eb.length, s"bm25 query: $q")
      gb.zip(eb).foreach { case ((gd, gs), (ed, es)) =>
        assert(math.abs(gs - es) <= 1e-9 * math.max(1.0, math.abs(es)), s"$q score")
        if (math.abs(gs - es) == 0) assert(gd == ed, s"$q doc")
      }
    }
  }

  test("doc_stats overwritten for re-indexed docs") {
    val _ = indexDir
    val stats = store.docStats(spark).join(store.docs(spark), "doc_id")
      .collect().map(r => DocKey(r.getAs[String]("conv_id"),
        r.getAs[Int]("turn_idx")) -> (r.getAs[Int]("word_count"), r.getAs[Int]("dl")))
      .toMap
    oracle.docStats.foreach { case (d, st) =>
      assert(stats(d) == st, s"doc_stats mismatch for $d")
    }
  }

  test("merge cost is Θ(batch): append-only delta, old bytes untouched") {
    val dir = tmpDir("graft-merge-econ")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, N, partitions = 4), dir, conf)
    val st = new IndexStore(dir)
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
    }
    val v1Postings = dirBytes(s"${st.snapshotDir(1)}/postings")
    val v1Docs = dirBytes(s"${st.snapshotDir(1)}/docs")
    val v1Mtimes = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(st.snapshotDir(1)))
        .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }
    // append-only batch: 15 brand-new conversations, zero overlap
    IndexMerger.merge(spark,
      TranscriptGen.batch2Dataset(spark, N, Extra, 0), dir, conf)
    assert(st.currentVersion.contains(2))
    // no term regrouped -> no replaced mask, the fast layered-read path
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${st.snapshotDir(2)}/replaced_terms")))
    // v1 data files are carried by reference: not one byte rewritten
    v1Mtimes.foreach { case (p, t) =>
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)).toMillis == t, s"v1 file rewritten: $p")
    }
    // the delta is batch-sized, not index-sized (15 vs 60 conversations)
    val v2Postings = dirBytes(s"${st.snapshotDir(2)}/postings")
    assert(v2Postings > 0)
    assert(v2Postings < v1Postings,
      s"postings delta $v2Postings !< full $v1Postings")
    val v2Docs = dirBytes(s"${st.snapshotDir(2)}/docs")
    assert(v2Docs < v1Docs, s"docs delta $v2Docs !< full $v1Docs")
    // and the merged snapshot still answers correctly
    val o = new Oracle(conf)
    o.indexAll(TranscriptGen.local(N.toInt))
    o.indexAll(TranscriptGen.batch2(N, Extra, 0))
    val s2 = new Searcher(spark, st, conf)
    val got = s2.searchCount("which").collect()
      .map { case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }.toMap
    assert(got == o.searchCount("which").toMap)
  }

  test("an empty batch merge is a no-op: no new snapshot, meta unchanged") {
    val dir = tmpDir("graft-merge-empty")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, 10, partitions = 2), dir, conf)
    val st = new IndexStore(dir)
    val before = st.currentMeta
    import spark.implicits._
    val meta = IndexMerger.merge(spark,
      spark.emptyDataset[graft.model.Turn], dir, conf)
    assert(meta == before)
    assert(st.currentVersion.contains(1))
  }

  test("a tokenless batch (all-empty texts) merges: doc rows kept, no postings delta") {
    val dir = tmpDir("graft-merge-tokenless")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, 10, partitions = 2), dir, conf)
    val st = new IndexStore(dir)
    val termsBefore = st.dict(spark).count()
    import spark.implicits._
    val blank = (0 until 5).map(i => graft.model.Turn(
      f"conv-blank-$i%03d", 0, "doc", "", null,
      java.sql.Timestamp.valueOf("2026-04-01 00:00:00")))
    IndexMerger.merge(spark, spark.createDataset(blank), dir, conf)
    assert(st.currentVersion.contains(2))
    val meta = st.currentMeta
    assert(meta.numDocs == st.docs(spark).count())
    // the S6 quirk at merge time: doc rows + zero-stats, dictionary unchanged
    assert(st.dict(spark).count() == termsBefore)
    val zeroStats = st.docStats(spark).join(st.docs(spark), "doc_id")
      .filter($"conv_id".startsWith("conv-blank"))
      .select($"word_count", $"dl").as[(Int, Int)].collect()
    assert(zeroStats.length == 5 && zeroStats.forall(_ == ((0, 0))))
    assert(graft.verify.IndexCheck.healthy(spark, st))
  }

  test("merge is resumable: re-merging the same batch is a no-op on content") {
    val _ = indexDir
    val before = store.currentMeta
    IndexMerger.merge(spark,
      TranscriptGen.batch2Dataset(spark, N, Extra, Overlap), indexDir, conf)
    val after = store.currentMeta
    assert(after.numDocs == before.numDocs)
    assert(after.numTerms == before.numTerms)
    assert(math.abs(after.avgdl - before.avgdl) < 1e-9)
  }
}
