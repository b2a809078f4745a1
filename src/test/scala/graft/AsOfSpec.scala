package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{Compactor, IndexBuilder, IndexDeleter, IndexMerger, IndexStore}
import graft.model.DocKey
import graft.search.Searcher

/** Point-in-time (as-of) search: a Searcher pinned to an older committed
  * snapshot answers exactly as the index did at that commit — tables,
  * collection stats, and the tombstone set all version-bound (the Iceberg
  * `VERSION AS OF` / Elasticsearch PIT posture, free by construction over
  * the immutable LSM snapshots).
  */
class AsOfSpec extends SparkTestBase {

  private val Query = "(which AND would)"
  private val Bm25Query = "which would there"

  // batch A = convs [0, 20), batch B = convs [20, 40) (disjoint): v1
  // indexes A, the merge commit v2 indexes A ∪ B
  private lazy val dir: String = {
    val d = tmpDir("graft-asof")
    IndexBuilder.build(spark, TranscriptGen.dataset(spark, 20, partitions = 4), d)
    IndexMerger.merge(spark, secondBatch(20, 20), d)
    d
  }

  private def secondBatch(n: Long, extra: Long) = {
    import spark.implicits._
    spark.createDataset(TranscriptGen.batch2(n, extra, overlap = 0))
  }

  // the ground truth for v1: an INDEPENDENT fresh build over batch A only
  private lazy val v1TruthDir: String = {
    val d = tmpDir("graft-asof-truth")
    IndexBuilder.build(spark, TranscriptGen.dataset(spark, 20, partitions = 4), d)
    d
  }

  private def counts(s: Searcher): Map[DocKey, Long] =
    s.searchCount(Query).collect().map {
      case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n
    }.toMap

  private def scores(s: Searcher): Map[DocKey, Double] =
    s.searchBm25(Bm25Query, k = 100000).collect().map {
      case Row(c: String, t: Int, v: Double) => DocKey(c, t) -> v
    }.toMap

  test("as-of v1 == a fresh index over the first batch, counts and BM25") {
    val pinned = new Searcher(spark, new IndexStore(dir), asOf = Some(1))
    val truth = new Searcher(spark, new IndexStore(v1TruthDir))
    assert(pinned.version === 1)
    // collection stats are the pinned snapshot's, not CURRENT's
    assert(pinned.meta.numDocs === truth.meta.numDocs)
    assert(pinned.meta.avgdl === truth.meta.avgdl)
    assert(counts(pinned) === counts(truth))
    assert(scores(pinned) === scores(truth)) // bit-exact incl. v1 stats
    pinned.close(); truth.close()
  }

  test("as-of CURRENT == the default searcher") {
    val store = new IndexStore(dir)
    val cur = store.currentVersion.get
    val pinned = new Searcher(spark, store, asOf = Some(cur))
    val default = new Searcher(spark, store)
    assert(pinned.version === default.version)
    assert(counts(pinned) === counts(default))
    assert(scores(pinned) === scores(default))
    pinned.close(); default.close()
  }

  test("a later delete is invisible as-of the pre-delete snapshot") {
    import spark.implicits._
    // own dir: the shared one must stay tombstone-free for the other tests
    val d = tmpDir("graft-asof-del")
    IndexBuilder.build(spark, TranscriptGen.dataset(spark, 20, partitions = 4), d)
    val preDelete = counts(new Searcher(spark, new IndexStore(d)))
    val delConv = preDelete.keys.map(_.conv_id).min // a conv with hits
    IndexDeleter.delete(spark, d, Seq(delConv).toDF("conv_id")) // commits v2
    val store = new IndexStore(d)
    val masked = new Searcher(spark, store) // CURRENT: tombstones mask
    val pinned = new Searcher(spark, store, asOf = Some(1))
    assert(counts(masked).keys.forall(_.conv_id != delConv))
    assert(counts(pinned) === preDelete) // v1 predates the tombstones
    // plan pin: the pinned snapshot has no tombstone table, so its plan
    // carries no anti-join — version binding is physical, not a filter
    def plan(s: Searcher) = s.searchCount(Query).queryExecution
      .explainString(org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    assert(plan(masked).contains("LeftAnti"))
    assert(!plan(pinned).contains("LeftAnti"))
    masked.close(); pinned.close()
  }

  test("out-of-range and garbage-collected versions are rejected") {
    val store = new IndexStore(dir)
    val cur = store.currentVersion.get
    intercept[IllegalArgumentException] {
      new Searcher(spark, store, asOf = Some(0))
    }
    intercept[IllegalArgumentException] {
      new Searcher(spark, store, asOf = Some(cur + 1))
    }
    // compaction collapses the chain; gc reclaims the unreferenced v1 —
    // pinning it afterwards must fail loudly, not read a half-deleted dir
    val d = tmpDir("graft-asof-gc")
    IndexBuilder.build(spark, TranscriptGen.dataset(spark, 6, partitions = 2), d)
    IndexMerger.merge(spark, secondBatch(6, 6), d)
    Compactor.compact(spark, d)
    val gcStore = new IndexStore(d)
    assert(gcStore.gc().contains(1))
    val e = intercept[IllegalArgumentException] {
      new Searcher(spark, gcStore, asOf = Some(1))
    }
    assert(e.getMessage.contains("garbage-collected"))
  }
}
