package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.EngineConf
import graft.search.Searcher

/** Keyset pagination (search_after): walking the BM25 ranking page by page
  * must reproduce the full ranking exactly — across tie groups, page sizes,
  * and both boolean shapes — and a stale/unknown cursor degrades to empty.
  * The cursor is the doc KEY only (scores re-derive internally), so the
  * walk is bit-stable even though WAND and the DataFrame algebra can
  * differ by 1 ULP. */
class PaginationSpec extends SparkTestBase {

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64,
    blockSize = 16)

  private lazy val indexDir: String = {
    val dir = tmpDir("graft-page-idx")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, 40, partitions = 4), dir, conf)
    dir
  }

  private lazy val searcher =
    new Searcher(spark, new IndexStore(indexDir), conf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, Double)] =
    df.collect().toSeq.map {
      case Row(c: String, t: Int, s: Double) => (c, t, s)
    }

  private def pageWalk(query: String, k: Int): Seq[(String, Int, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
    var page = rows(searcher.searchBm25Page(query, k))
    while (page.nonEmpty) {
      out ++= page
      val (c, t, _) = page.last
      page = rows(searcher.searchBm25Page(query, k, Some((c, t))))
    }
    out.toSeq
  }

  test("page walk reproduces the full ranking exactly (ties included)") {
    for (q <- Seq("which would there", "(which AND would)"); k <- Seq(7, 50)) {
      // the full ranking in one shot through the same algebra path
      val full = rows(searcher.searchBm25(q, 100000, useWand = false))
      assert(full.size > 7, s"fixture too small for $q") // k=7 multi-pages
      assert(pageWalk(q, k) === full, s"q=$q k=$k")
    }
  }

  test("a WAND page-1 key still works as a cursor (key-only contract)") {
    val q = "which would there"
    val p1 = rows(searcher.searchBm25(q, 10)) // WAND path
    val (c, t, _) = p1.last
    val p2 = rows(searcher.searchBm25Page(q, 10, Some((c, t))))
    assert(p2.nonEmpty)
    assert(p1.map(r => (r._1, r._2)).toSet
      .intersect(p2.map(r => (r._1, r._2)).toSet).isEmpty)
    // the ranking's order holds across the page boundary (tolerance: the
    // two paths may disagree by 1 ULP on the cursor doc itself)
    assert(p2.head._3 <= p1.last._3 + 1e-9)
  }

  test("seeded fuzz: page walks reproduce full rankings at random k") {
    val rnd = new scala.util.Random(0x9A6E5)
    val queries = Seq("which would", """("there" OR "search")""",
      "(whichever AND would)", "assistant message which")
    for (q <- queries) {
      val full = rows(searcher.searchBm25(q, 100000, useWand = false))
      val k = 1 + rnd.nextInt(math.max(1, full.size)) // 1..|hits|
      assert(pageWalk(q, k) === full, s"q=$q k=$k")
    }
  }

  test("a tombstoned boundary doc still works as a cursor") {
    import spark.implicits._
    // own index: the shared one must stay tombstone-free
    val dir = tmpDir("graft-page-del")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, 40, partitions = 4), dir, conf)
    val clean = new Searcher(spark, new IndexStore(dir), conf)
    val q = "which would there"
    val full = rows(clean.searchBm25(q, 100000, useWand = false))
    val p1 = rows(clean.searchBm25Page(q, 10))
    val (bc, bt, _) = p1.last
    clean.close()
    // delete the boundary doc's conversation mid-walk
    graft.index.IndexDeleter.delete(spark, dir, Seq(bc).toDF("conv_id"))
    val masked = new Searcher(spark, new IndexStore(dir), conf)
    val p2After = rows(masked.searchBm25Page(q, 10, Some((bc, bt))))
    // the walk continues: the cursor resolves through the UNMASKED doc
    // table; the page itself masks. Survivors keep their exact scores
    // (the stale-stats tombstone contract), so the page equals the
    // pre-delete ranking after the cursor, minus the deleted conv
    val cut = full.indexWhere(r => r._1 == bc && r._2 == bt)
    assert(cut >= 0)
    assert(p2After === full.drop(cut + 1).filter(_._1 != bc).take(10))
    assert(p2After.nonEmpty)
    masked.close()
  }

  test("unknown cursor key, non-hit cursor, and bad inputs degrade to empty") {
    val q = "which would there"
    assert(searcher.searchBm25Page(q, 10, Some(("no-such-conv", 0)))
      .collect().isEmpty)
    assert(searcher.searchBm25Page(q, 0,
      Some((TranscriptGen.convId(0L), 0))).collect().isEmpty)
    assert(searcher.searchBm25Page("((((broken", 10,
      Some((TranscriptGen.convId(0L), 0))).collect().isEmpty)
  }
}
