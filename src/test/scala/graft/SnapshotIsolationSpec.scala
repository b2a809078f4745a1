package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexMerger, IndexStore}
import graft.model.{DocKey, EngineConf}
import graft.search.Searcher
import graft.verify.Oracle

/** Read-while-write isolation: the CURRENT-flip snapshot commit means a
  * live searcher keeps answering from the snapshot it pinned while a
  * merge builds and commits the next one — no torn reads, no partial
  * batch visibility — and a searcher opened AFTER the commit sees the
  * fully merged truth. This is the service contract a search cluster
  * relies on during continuous ingest. */
class SnapshotIsolationSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 32,
    blockSize = 8)

  private def countMap(rows: Array[Row]): Map[DocKey, Long] =
    rows.map { case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }
      .toMap

  test("searches race a merge commit without torn or partial reads") {
    val dir = tmpDir("graft-isolation")
    val b1 = TranscriptGen.local(25)
    IndexBuilder.build(spark, spark.createDataset(b1), dir, conf)

    val store = new IndexStore(dir)
    val searcher = new Searcher(spark, store, conf)
    val query = "(which AND would)"
    val baseline = countMap(searcher.searchCount(query).collect())
    assert(baseline.nonEmpty)

    // merge a second batch on another thread while this thread hammers
    // the pinned searcher
    val b2 = TranscriptGen.batch2Dataset(spark, 25, extra = 15, overlap = 5)
    val mergeF = Future { IndexMerger.merge(spark, b2, dir, conf) }
    // do-while: at least one search always runs (concurrently when the
    // window is open; the equality contract holds either way, so a warm
    // JVM finishing the merge quickly cannot flake the suite)
    var iterations = 0
    var raced = false
    while (iterations == 0 || !mergeF.isCompleted) {
      raced |= !mergeF.isCompleted
      val got = countMap(searcher.searchCount(query).collect())
      assert(got == baseline,
        s"iteration $iterations: pinned searcher saw a different snapshot")
      iterations += 1
    }
    Await.result(mergeF, Duration.Inf)
    info(s"$iterations searches, race window open for at least " +
      s"${if (raced) iterations - 1 else 0} of them")

    // repeatable read: the live searcher STILL answers from its snapshot
    assert(countMap(searcher.searchCount(query).collect()) == baseline)
    searcher.close()

    // a fresh searcher sees the fully merged truth — checked against the
    // oracle fed both batches
    val oracle = new Oracle(conf)
    oracle.indexAll(b1)
    oracle.indexAll(b2.collect().toSeq)
    val after = new Searcher(spark, new IndexStore(dir), conf)
    val got = countMap(after.searchCount(query).collect())
    assert(got == oracle.searchCount(query).toMap)
    assert(got != baseline, "merge should have changed this query's result")
    after.close()
  }
}
