package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{Codec, Compactor, IndexBuilder, IndexDeleter, IndexMerger, IndexStore}
import graft.model.{DocKey, EngineConf, Turn}
import graft.search.Searcher

/** Document deletion (LSM tombstones): masked hits before compaction with
  * the Lucene stale-stats contract, resurrection on re-index, and the
  * compaction purge equalling a fresh build over the live corpus. */
class DeleteSpec extends SparkTestBase {

  private val NConvs = 40
  // small parts/blocks so tombstoned docs cross part boundaries
  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64, blockSize = 16)

  private lazy val full: Seq[Turn] = TranscriptGen.local(NConvs)

  // conv-level deletions (every 5th conversation) plus ONE turn-level key
  private val delConvs: Set[String] =
    (0 until NConvs).filter(_ % 5 == 2)
      .map(i => TranscriptGen.convId(i.toLong)).toSet
  // a multi-turn, multi-hit conversation (14 % 5 != 2, so not conv-deleted)
  private val delTurn = DocKey(TranscriptGen.convId(14L), 0)
  private def isDeleted(k: DocKey): Boolean =
    delConvs.contains(k.conv_id) || k == delTurn

  private def buildIndex(): String = {
    val dir = tmpDir("graft-del-idx")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, NConvs.toLong, partitions = 4), dir, conf)
    dir
  }

  private def deleteKeys(dir: String): Long = {
    import spark.implicits._
    val keys = spark.createDataset(
        delConvs.toSeq.sorted.map(c => (c, None: Option[Int])) :+
          (delTurn.conv_id, Some(delTurn.turn_idx)))
      .select($"_1".as("conv_id"), $"_2".as("turn_idx"))
    IndexDeleter.delete(spark, dir, keys)._2
  }

  private def counts(s: Searcher, q: String): Map[DocKey, Long] =
    s.searchCount(q).collect().map {
      case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n
    }.toMap

  private def bm25Map(s: Searcher, q: String, wand: Boolean)
      : Map[DocKey, Double] =
    s.searchBm25(q, k = 100000, useWand = wand).collect().map {
      case Row(c: String, t: Int, v: Double) => DocKey(c, t) -> v
    }.toMap

  // one tombstoned index shared by the masking tests
  private lazy val delDir: String = {
    val dir = buildIndex()
    val n = deleteKeys(dir)
    assert(n > 0)
    dir
  }
  private lazy val fullDir: String = buildIndex()

  private val queries = Seq("which", "would", "(which AND would)",
    "(which NOT would)", "\"people\"", TranscriptGen.UniqueWord)

  test("tombstoned docs stop matching; live counts unchanged") {
    val sFull = new Searcher(spark, new IndexStore(fullDir), conf)
    val sDel = new Searcher(spark, new IndexStore(delDir), conf)
    for (q <- queries) {
      val expected = counts(sFull, q).filter { case (k, _) => !isDeleted(k) }
      assert(counts(sDel, q) == expected, s"query: $q")
    }
    // fixture sanity: turn-granularity is actually exercised — some OTHER
    // turn of the turn-deleted conversation matches somewhere (and the
    // equality above then proves it survived the delete)
    assert(queries.exists(q => counts(sFull, q).keys.exists(k =>
      k.conv_id == delTurn.conv_id && k != delTurn)))
  }

  test("BM25 under tombstones: WAND skip == DF mask == post-hoc filter") {
    val sFull = new Searcher(spark, new IndexStore(fullDir), conf)
    val sDel = new Searcher(spark, new IndexStore(delDir), conf)
    for (q <- Seq("which", "(which OR would)", "people")) {
      // stale-stats contract: live docs keep their EXACT score — compared
      // per path (WAND associates b·(dl/avgdl), the DF algebra (b·dl)/
      // avgdl, so cross-path equality only holds to the last ulp)
      def live(m: Map[DocKey, Double]) =
        m.filter { case (k, _) => !isDeleted(k) }
      assert(bm25Map(sDel, q, wand = true) ==
        live(bm25Map(sFull, q, wand = true)), s"WAND query: $q")
      assert(bm25Map(sDel, q, wand = false) ==
        live(bm25Map(sFull, q, wand = false)), s"DF query: $q")
    }
  }

  test("stats stay as-of the snapshot until compaction (Lucene contract)") {
    val before = new IndexStore(fullDir).currentMeta
    val after = new IndexStore(delDir).currentMeta
    assert(after.numDocs == before.numDocs)
    assert(after.avgdl == before.avgdl)
    assert(after.numTerms == before.numTerms)
    // ...and the structural check still passes over the layered tables
    val bad = graft.verify.IndexCheck.run(spark,
      new IndexStore(delDir)).collect().map(_.getLong(1)).sum
    assert(bad == 0)
  }

  test("unknown keys and repeated deletes are no-ops") {
    import spark.implicits._
    val store = new IndexStore(delDir)
    val v = store.currentVersion.get
    val unknown = spark.createDataset(Seq("no-such-conv"))
      .select($"value".as("conv_id"))
    assert(IndexDeleter.delete(spark, delDir, unknown)._2 == 0)
    assert(deleteKeys(delDir) == 0) // idempotent
    assert(store.currentVersion.get == v) // nothing committed
  }

  test("re-indexing a tombstoned key resurrects it") {
    import spark.implicits._
    val dir = buildIndex()
    val uniqueConv = TranscriptGen.convId(0) // holds UniqueWord at turn 1
    val keys = spark.createDataset(Seq(uniqueConv)).select($"value".as("conv_id"))
    assert(IndexDeleter.delete(spark, dir, keys)._2 > 0)
    val gone = new Searcher(spark, new IndexStore(dir), conf)
    assert(counts(gone, TranscriptGen.UniqueWord).isEmpty)
    // merge the same conversation back (ids kept, tombstones shrink)
    val batch = TranscriptGen.dataset(spark, NConvs.toLong, partitions = 2)
      .filter(_.conv_id == uniqueConv)
    IndexMerger.merge(spark, batch, dir, conf)
    val back = new Searcher(spark, new IndexStore(dir), conf)
    assert(counts(back, TranscriptGen.UniqueWord).keySet ==
      Set(DocKey(uniqueConv, 1)))
    // full resurrection leaves an empty (sentinel-only) tombstone set
    assert(new IndexStore(dir).deletedIds(spark)
      .forall(_.isEmpty))
  }

  test("compaction purges: equals a fresh build over the live corpus") {
    import spark.implicits._
    val dir = buildIndex()
    deleteKeys(dir)
    Compactor.compact(spark, dir, conf)
    val store = new IndexStore(dir)
    assert(store.deletedIds(spark).isEmpty)

    // physical purge: no tombstoned id anywhere in docs or decoded postings
    val liveKeys = full.map(t => DocKey(t.conv_id, t.turn_idx))
      .filterNot(isDeleted).toSet
    val docKeys = store.docs(spark).collect()
      .map(r => DocKey(r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")))
      .toSet
    assert(docKeys == liveKeys)
    val docIds = store.docs(spark).select($"doc_id").as[Long].collect().toSet
    val postedIds = store.postings(spark).select($"bytes")
      .as[Array[Byte]].collect()
      .flatMap(b => Codec.decodeAll(b).map(_.docId)).toSet
    assert(postedIds.subsetOf(docIds))
    assert(store.currentMeta.numDocs == liveKeys.size)

    // fresh build over the live corpus: identical counts AND scores
    // (df/numDocs/avgdl all recomputed — the purge restores exactness)
    val freshDir = tmpDir("graft-del-fresh")
    // local copies: the filter closure must not capture the suite instance
    val (dc, dtc, dti) = (delConvs, delTurn.conv_id, delTurn.turn_idx)
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, NConvs.toLong, partitions = 4)
        .filter(t => !(dc.contains(t.conv_id) ||
          (t.conv_id == dtc && t.turn_idx == dti))),
      freshDir, conf)
    val sC = new Searcher(spark, store, conf)
    val sF = new Searcher(spark, new IndexStore(freshDir), conf)
    for (q <- queries)
      assert(counts(sC, q) == counts(sF, q), s"count query: $q")
    for (q <- Seq("which", "(which OR would)"))
      assert(bm25Map(sC, q, wand = true) == bm25Map(sF, q, wand = true),
        s"bm25 query: $q")
  }

  test("gc keeps the tombstone table live until compaction drops it") {
    val dir = buildIndex()
    deleteKeys(dir)
    val store = new IndexStore(dir)
    assert(store.gc().isEmpty) // delete layer references the build's dirs
    assert(store.deletedIds(spark).nonEmpty) // tombstones survived gc
    Compactor.compact(spark, dir, conf)
    assert(store.gc().nonEmpty) // pre-compaction versions now garbage
    assert(store.deletedIds(spark).isEmpty)
  }

  test("DeleteDocsMain key parsing") {
    import graft.app.DeleteDocsMain.parseKey
    assert(parseKey("conv-000002") == ("conv-000002", None))
    assert(parseKey("conv-000002:3") == ("conv-000002", Some(3)))
    assert(parseKey("a:b:7") == ("a:b", Some(7)))
    assert(parseKey("a:") == ("a:", None)) // empty tail is conv text
    assert(parseKey("a:12x") == ("a:12x", None))
  }
}
