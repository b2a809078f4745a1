package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.DocKey
import graft.search.Searcher

/** `term^N` boosts in the extended boolean language: rewrite unit cases,
  * scoring composition identities (plain, wildcard, quoted, and boosted
  * slop/fuzzy sentinels), and the Lucene posture that counting ignores
  * boosts entirely. */
class BoostSpec extends SparkTestBase {
  import spark.implicits._

  private val NConvs = 30

  private lazy val corpusDs = TranscriptGen.dataset(spark, NConvs.toLong,
    partitions = 4)
  private lazy val indexDir: String = {
    val dir = tmpDir("graft-boost-idx")
    IndexBuilder.build(spark, corpusDs, dir)
    dir
  }
  private lazy val searcher = new Searcher(spark, new IndexStore(indexDir))

  private def scoresExt(q: String): Map[DocKey, Double] =
    searcher.searchBm25WithPhrases(corpusDs, q, k = 100000).collect().map {
      case Row(c: String, t: Int, v: Double) => DocKey(c, t) -> v
    }.toMap

  private def countsExt(q: String): Map[DocKey, Long] =
    searcher.searchCountWithPhrases(corpusDs, q).collect().map {
      case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n
    }.toMap

  /** Single-word BM25 per-doc map on the DF-algebra path (the boost
    * branch's arithmetic twin — WAND associates one formula term
    * differently, so identities must stay on one path). */
  private def scores1(q: String): Map[DocKey, Double] =
    searcher.searchBm25(q, k = 100000, useWand = false).collect().map {
      case Row(c: String, t: Int, v: Double) => DocKey(c, t) -> v
    }.toMap

  test("rewriteBoost unit cases") {
    val (r1, m1) = Searcher.rewriteBoost("customer^2")
    assert(m1.values.toSeq == Seq(("customer", false, 2.0)))
    assert(r1 == "\"" + m1.keys.head + "\"")
    val (r2, m2) = Searcher.rewriteBoost("\"Customer\"^2.5 AND stream")
    assert(m2.values.toSeq == Seq(("customer", true, 2.5)))
    assert(r2.endsWith(" AND stream"))
    // passthroughs: ^ not after a word/quote, or not followed by a digit
    for (q <- Seq("a ^2", "word^", "word^x", "2^2", "w ^ 3"))
      assert(Searcher.rewriteBoost(q) == ((q, Map.empty)), q)
    // digits then a bare dot: the dot stays query text
    val (r3, m3) = Searcher.rewriteBoost("word^2.")
    assert(m3.values.toSeq == Seq(("word", false, 2.0)) && r3.endsWith("\"."))
    // sentinel base collision grows
    val (_, m4) = Searcher.rewriteBoost("graftboostqa word^3")
    assert(m4.keys.head.startsWith("graftboostqq"))
    // composition: boost runs LAST, so slop/fuzzy sentinels can be boosted
    val (rwe, pm, fm, sm, bm) = Searcher.rewriteExtended(
      "'alpha bravo'~2^3 AND ~wordz^2 OR \"stream\"^1.5")
    assert(pm.isEmpty && sm.size == 1 && fm.size == 1 && bm.size == 3)
    val inners = bm.values.map(_._1).toSet
    assert(inners == Set(sm.keys.head, fm.keys.head, "stream"))
    assert(bm.values.map(_._3).toSet == Set(3.0, 2.0, 1.5))
    assert(!rwe.contains("^") && !rwe.contains("~") && !rwe.contains("'"))
  }

  test("boosted scores compose: quoted, wildcard, and ^1 identity") {
    // ("which"^2 OR "would"): per doc 2·s(which) + s(would), exactly
    val s1 = scores1("\"which\"")
    val s2 = scores1("\"would\"")
    val expected = (s1.keySet ++ s2.keySet).map { k =>
      k -> (s1.get(k).map(_ * 2.0), s2.get(k)) match {
        case (key, (Some(a), Some(b))) => key -> (a + b)
        case (key, (Some(a), None)) => key -> a
        case (key, (None, b)) => key -> b.get
      }
    }.toMap
    assert(scoresExt("(\"which\"^2 OR \"would\")") == expected)
    // wildcard semantics survive the boost: whic^2 == 2 × the prefix query
    val sw = scores1("whic")
    assert(scoresExt("whic^2") == sw.map { case (k, v) => k -> v * 2.0 })
    // ^1 is the identity
    assert(scoresExt("(which^1 OR would)") == scoresExt("(which OR would)"))
    // boost scales relative rank: a tiny boost can't create/drop hits
    assert(scoresExt("(which^0.5 OR would)").keySet ==
      scoresExt("(which OR would)").keySet)
  }

  test("boosted slop and fuzzy sentinels re-dispatch and scale") {
    val slop = "'which would'~4"
    val base = scoresExt(s"($slop OR \"people\")")
    val s1 = scoresExt(slop)
    assert(s1.nonEmpty) // fixture sanity: the slop phrase actually hits
    val boosted = scoresExt(s"($slop^3 OR \"people\")")
    val sw = scores1("\"people\"")
    val expected = (s1.keySet ++ sw.keySet).map { k =>
      k -> (s1.get(k).map(_ * 3.0).getOrElse(0.0) + sw.getOrElse(k, 0.0))
    }.toMap
    assert(boosted == expected)
    assert(base.keySet == boosted.keySet)
    // boosted fuzzy term: ~whichh^2 == 2 × ~whichh per doc
    val f1 = scoresExt("~whichh")
    assert(f1.nonEmpty)
    assert(scoresExt("~whichh^2") == f1.map { case (k, v) => k -> v * 2.0 })
  }

  test("counting ignores boosts (the Lucene posture)") {
    for (q <- Seq("(which AND would)", "(which OR would)",
        "('customer message'~4 AND which)")) {
      val boosted = q.replace("which", "which^7")
      assert(countsExt(boosted) == countsExt(q), q)
    }
  }
}
