package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.DocKey
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** Query-time synonym expansion (the one-way Solr synonym-filter
  * posture): brute-force count identities, Q6 dedup of a synonym also
  * caught by the word's prefix, min-length-quirk rescue, BM25 sums, and
  * the malformed-frame tolerance. */
class SynonymSpec extends SparkTestBase {
  import spark.implicits._

  private val NConvs = 30

  private lazy val corpus = TranscriptGen.local(NConvs)
  private lazy val indexDir: String = {
    val dir = tmpDir("graft-syn-idx")
    IndexBuilder.build(spark,
      TranscriptGen.dataset(spark, NConvs.toLong, partitions = 4), dir)
    dir
  }
  private lazy val searcher = new Searcher(spark, new IndexStore(indexDir))

  private def synDf(pairs: (String, String)*): DataFrame =
    spark.createDataset(pairs.toSeq).toDF("term", "synonym")

  private def counts(syn: DataFrame, q: String): Map[DocKey, Long] =
    searcher.searchCountSynonyms(syn, q).collect().map {
      case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n
    }.toMap

  private def scores(syn: DataFrame, q: String): Map[DocKey, Double] =
    searcher.searchBm25Synonyms(syn, q, k = 100000).collect().map {
      case Row(c: String, t: Int, v: Double) => DocKey(c, t) -> v
    }.toMap

  private def scores1(q: String): Map[DocKey, Double] =
    searcher.searchBm25(q, k = 100000, useWand = false).collect().map {
      case Row(c: String, t: Int, v: Double) => DocKey(c, t) -> v
    }.toMap

  /** Brute force: distinct group members present in the doc's token set. */
  private def bruteGroup(group: Seq[String]): Map[DocKey, Long] =
    corpus.flatMap { t =>
      val toks = Tokenizer.tokens(t.text).toSet
      val n = group.count(toks.contains)
      if (n > 0) Some(DocKey(t.conv_id, t.turn_idx) -> n.toLong) else None
    }.toMap

  test("expanded counts == brute-force group membership") {
    val syn = synDf("which" -> "would", "which" -> "there")
    assert(counts(syn, "\"which\"") ==
      bruteGroup(Seq("which", "would", "there")))
    // a synonym the dictionary lacks adds nothing
    val syn2 = synDf("which" -> "zzzzmissing")
    assert(counts(syn2, "\"which\"") == bruteGroup(Seq("which")))
  }

  test("Q6 dedup: a synonym also caught by the word's prefix counts once") {
    // unquoted 'which' prefix-matches the dictionary word 'which'; the
    // synonym names the same word again — dedup keeps one count
    val syn = synDf("which" -> "which")
    assert(counts(syn, "which") == counts(synDf(), "which"))
  }

  test("expansion rescues a word the min-length quirk rejects") {
    // 'whic' parses but the wildcard min-length quirk (<= min-char)
    // makes it match nothing alone...
    assert(searcher.searchCount("whic").collect().isEmpty)
    // ...its synonym group still matches (exact terms skip the quirk);
    // a PARSER-rejected word (3 chars) can never be rescued — the
    // reference grammar drops it before expansion sees it
    val syn = synDf("whic" -> "which")
    assert(counts(syn, "whic") == bruteGroup(Seq("which")))
    assert(counts(synDf("abc" -> "which"), "abc").isEmpty)
  }

  test("boolean structure survives expansion") {
    val syn = synDf("which" -> "would")
    val grp = bruteGroup(Seq("which", "would"))
    val ppl = bruteGroup(Seq("people"))
    val expected = grp.keySet.intersect(ppl.keySet)
      .map(k => k -> (grp(k) + ppl(k))).toMap
    assert(counts(syn, "(\"which\" AND \"people\")") == expected)
  }

  test("BM25 expansion sums the group's term scores") {
    val syn = synDf("which" -> "would")
    val s1 = scores1("\"which\"")
    val s2 = scores1("\"would\"")
    val expected = (s1.keySet ++ s2.keySet).map { k =>
      k -> (s1.getOrElse(k, 0.0) + s2.getOrElse(k, 0.0))
    }.toMap
    assert(scores(syn, "\"which\"") == expected)
  }

  test("malformed synonym frames degrade to plain search") {
    val bad = spark.createDataset(Seq(("a", "b"))).toDF("x", "y")
    assert(counts(bad, "\"which\"") == bruteGroup(Seq("which")))
    // null/garbage synonym values are dropped, not crashed on
    val garbage = spark.createDataset(Seq(
      ("which", "wo uld"), ("which", ""), ("which", "Would")))
      .toDF("term", "synonym")
    assert(counts(garbage, "\"which\"") ==
      bruteGroup(Seq("which", "would")))
  }

  test("--syn CLI spec parsing and validation") {
    import graft.app.SearchMain
    assert(SearchMain.parseSynSpec("customer:client,buyer;stream:flow") ==
      Seq(("customer", "client"), ("customer", "buyer"), ("stream", "flow")))
    assert(SearchMain.parseSynSpec("Broken;w:;:x;ok:One") ==
      Seq(("ok", "one")))
    assert(SearchMain.resolve(Array("/idx", "q", "--syn=a:b"))
      .exists(_.syn.contains("a:b")))
    assert(SearchMain.resolve(Array("/idx", "q", "--mode=phrase",
      "--corpus=gen:5", "--syn=a:b")).isLeft)
    assert(SearchMain.resolve(Array("/idx", "q", "--syn=a:b",
      "--where=role = 'user'", "--corpus=gen:5")).isLeft)
  }
}
