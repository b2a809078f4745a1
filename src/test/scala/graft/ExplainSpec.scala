package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.EngineConf
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** Score explanation: the per-word BM25 breakdown must be assembled from
  * the exact statistics the ranking used — tf/df from the index, idf and
  * tfnorm from the shared formula blocks — so the contributions sum to the
  * doc's actual score and every number survives a brute-force recount. */
class ExplainSpec extends SparkTestBase {

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64,
    blockSize = 16)
  private val NConvs = 40

  private lazy val indexDir: String = {
    val dir = tmpDir("graft-explain-idx")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, NConvs.toLong, partitions = 4), dir, conf)
    dir
  }
  private lazy val searcher =
    new Searcher(spark, new IndexStore(indexDir), conf)

  // brute-force per-doc tf and corpus df over the same generated corpus
  private lazy val truth: Map[(String, Int), Map[String, Int]] =
    TranscriptGen.local(NConvs).map { t =>
      (t.conv_id, t.turn_idx) -> Tokenizer.stats(t.text).tf.toMap
    }.toMap
  private def dfOf(word: String): Long =
    truth.values.count(_.contains(word)).toLong

  private def explain(q: String, c: String, t: Int)
      : Seq[(String, Double, Double, Double, Double, Double)] =
    searcher.explainScore(q, c, t).collect().toSeq.map {
      case Row(w: String, tf: Double, df: Double, idf: Double,
          tfn: Double, ct: Double) => (w, tf, df, idf, tfn, ct)
    }

  test("tf/df in the breakdown survive a brute-force recount") {
    val q = """"which" "would""""
    // a doc that verifiably holds BOTH words — the breakdown must list both
    val (c, t) = truth.collect {
      case (k, tf) if tf.contains("which") && tf.contains("would") => k
    }.minBy(identity)
    val rows = explain(q, c, t)
    assert(rows.map(_._1).sorted === Seq("which", "would"))
    for ((w, tf, df, _, _, _) <- rows) {
      assert(tf === truth((c, t))(w).toDouble, w)
      assert(df === dfOf(w).toDouble, w)
    }
  }

  test("contributions reproduce the doc's ranking score") {
    val q = """"which" "would""""
    val ranked = searcher.searchBm25(q, 1000, useWand = false).collect()
    for (row <- ranked.take(5)) {
      val Row(c: String, t: Int, score: Double) = row
      val rows = explain(q, c, t)
      // two-operand IEEE sums are commutative — exact
      assert(rows.map(_._6).sum === score, s"$c:$t")
      // contribution = idf * tfnorm, one multiply
      rows.foreach { case (w, _, _, idf, tfn, ct) =>
        assert(ct === idf * tfn, w) }
    }
  }

  test("boolean structure: NOT'd docs are empty, erased branches vanish") {
    def score(q: String): Map[(String, Int), Double] =
      searcher.searchBm25(q, 100000).collect().map {
        case Row(c: String, t: Int, s: Double) => (c, t) -> s
      }.toMap
    val qNot = """("which" NOT "would")"""
    // a doc holding BOTH words is not a hit → empty (Lucene match=false)
    val both = truth.collect {
      case (k, tf) if tf.contains("which") && tf.contains("would") => k
    }.minBy(identity)
    assert(explain(qNot, both._1, both._2).isEmpty)
    // a which-only doc is a hit: the breakdown lists ONLY the positive
    // word and reproduces the ranking's score
    val only = truth.collect {
      case (k, tf) if tf.contains("which") && !tf.contains("would") => k
    }.minBy(identity)
    val rows = explain(qNot, only._1, only._2)
    assert(rows.map(_._1) === Seq("which"))
    assert(rows.map(_._6).sum === score(qNot)(only))
    // mixed tree: a doc erased from one branch but a hit through the OR —
    // the erased branch's word must NOT appear, and the sum still matches
    val qMix = """(("which" NOT "would") OR "there")"""
    val all3 = truth.collect {
      case (k, tf) if tf.contains("which") && tf.contains("would") &&
        tf.contains("there") => k
    }
    assert(all3.nonEmpty, "fixture lacks a which+would+there doc")
    val k3 = all3.minBy(identity)
    val rows3 = explain(qMix, k3._1, k3._2)
    assert(rows3.map(_._1) === Seq("there"))
    assert(rows3.map(_._6).sum === score(qMix)(k3))
  }

  test("dictStats == brute-force per-letter aggregates") {
    // reuses this suite's truth fixture: the dictionary is exactly the
    // distinct kept words, df = docs containing each word
    val words = truth.values.flatMap(_.keys).toSet
    val byLetter = words.groupBy(_.substring(0, 1))
    val got = searcher.dictStats().collect().map {
      case Row(l: String, n: Long, s: Long, tt: String, td: Long) =>
        l -> ((n, s, tt, td))
    }.toMap
    assert(got.keySet === byLetter.keySet)
    for ((l, ws) <- byLetter) {
      val dfs = ws.map(w => w -> dfOf(w)).toSeq
      val (n, s, tt, td) = got(l)
      assert(n === ws.size.toLong, l)
      assert(s === dfs.map(_._2).sum, l)
      val top = dfs.minBy { case (w, d) => (-d, w) }
      assert((tt, td) === top, l)
    }
  }

  test("unknown doc, malformed query, and no-match docs are empty") {
    assert(explain(""""which"""", "no-such-conv", 0).isEmpty)
    assert(explain("((((broken", TranscriptGen.convId(0L), 0).isEmpty)
    assert(explain(""""zzzznope"""", TranscriptGen.convId(0L), 0).isEmpty)
  }
}
