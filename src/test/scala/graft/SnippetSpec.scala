package graft

import org.apache.spark.sql.Row

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.Turn
import graft.search.{QueryParser, Searcher}
import graft.tokenize.Tokenizer

/** Result snippets: the engine's builtin-composed token window against a
  * local brute force over [[Tokenizer.tokens]], across widths and query
  * shapes (exact, wildcard, boolean, NOT). */
class SnippetSpec extends SparkTestBase {

  private lazy val corpus: Seq[Turn] =
    TranscriptGen.dataset(spark, 30).collect().toSeq

  private lazy val idxDir: String = {
    val dir = tmpDir("graft-snip-idx")
    IndexBuilder.build(spark, spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[Turn]), dir)
    dir
  }
  private lazy val searcher = new Searcher(spark, new IndexStore(idxDir))

  /** Local mirror: window of `width` tokens around the first match. */
  private def bruteSnippet(text: String, words: Seq[(String, Boolean)],
      width: Int): Option[String] = {
    val toks = Tokenizer.tokens(text)
    val p = toks.indexWhere(t => words.exists { case (w, e) =>
      if (e) t == w else t.startsWith(w) })
    if (p < 0) None
    else Some(toks.slice(math.max(0, p - width), p + width + 1)
      .mkString(" "))
  }

  private def engine(query: String, width: Int, k: Int)
      : Seq[(String, Int, Long, String)] =
    searcher.searchSnippets(spark.createDataset(corpus)(
        org.apache.spark.sql.Encoders.product[Turn]), query, width, k)
      .collect().map {
        case Row(c: String, t: Int, n: Long, s: String) => (c, t, n, s)
      }.toSeq

  test("snippets match brute force across widths and query shapes") {
    // "whic would": whic is a VALID 4-char wildcard that the min-length
    // quirk makes unmatchable — it must neither anchor snippets nor
    // contribute hits ("whi would" would be an INVALID query: unquoted
    // terms need length 4+, and one bad word voids the reference query)
    for (q <- Seq("which", "\"would\"", "whic would", "which NOT would");
         width <- Seq(0, 2, 5)) {
      val got = engine(q, width, 8)
      assert(got.nonEmpty, s"q=$q w=$width")
      val parsed = QueryParser.parse("(" + q + ")", exactMatch = false)
      val words = parsed.searchWords.distinct.filter { case (w, e) =>
        w.nonEmpty && (e || w.length > 4) }
      val byKey = corpus.map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
      got.foreach { case (c, t, _, s) =>
        assert(bruteSnippet(byKey((c, t)), words, width).contains(s),
          s"q=$q w=$width key=($c,$t)")
      }
      // the hit set and counts are searchCount's own top-k
      val exp = searcher.searchCount(q).limit(8).collect()
        .map { case Row(c: String, t: Int, n: Long) => (c, t, n) }.toSet
      assert(got.map(x => (x._1, x._2, x._3)).toSet == exp, s"q=$q")
    }
  }

  test("snippet rejects malformed input") {
    val ds = spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[Turn])
    assert(searcher.searchSnippets(ds, "((broken", 3, 5).isEmpty)
    assert(searcher.searchSnippets(ds, "which", -1, 5).isEmpty)
    assert(searcher.searchSnippets(ds, "which", 3, 0).isEmpty)
    // all-wildcard query below the min-length quirk: no anchor words
    assert(searcher.searchSnippets(ds, "whi", 3, 5).isEmpty)
  }
}
