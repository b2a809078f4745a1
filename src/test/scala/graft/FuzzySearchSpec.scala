package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.index.{IndexBuilder, IndexStore}
import graft.model.{DocKey, Turn}
import graft.search.{Fuzzy, Searcher}
import graft.tokenize.Tokenizer

/** Fuzzy term search: the generated 1-edit neighborhood against a local
  * levenshtein (seeded fuzz over the iff property), and both engine paths
  * (bounded-neighborhood probe, bounded-levenshtein dictionary scan)
  * against brute force over [[Tokenizer.tokens]]. */
class FuzzySearchSpec extends SparkTestBase {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2026-01-01 00:00:00")
  private def turn(conv: String, idx: Int, text: String): Turn =
    Turn(conv, idx, "doc", text, null, ts)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("neighborhood1: membership iff levenshtein <= 1 (seeded fuzz)") {
    val rnd = new scala.util.Random(20260818)
    // a small alphabet makes 1-edit collisions common enough to matter
    def word(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 0 until 2000) {
      val a = word(3 + rnd.nextInt(5))
      val b = word(3 + rnd.nextInt(5))
      val hood = Fuzzy.neighborhood1(a, minLen = 1, maxLen = 100).toSet
      assert(hood.contains(b) == (lev(a, b) <= 1),
        s"a=$a b=$b lev=${lev(a, b)}")
    }
  }

  test("neighborhood1: length bounds filter and determinism") {
    val h = Fuzzy.neighborhood1("abcd", minLen = 4, maxLen = 4)
    assert(h.forall(_.length == 4))
    assert(h == h.sorted && h.distinct == h)
    assert(h.contains("abcd") && h.contains("abce") && !h.contains("abc"))
    assert(Fuzzy.neighborhood1("abcd") == Fuzzy.neighborhood1("abcd"))
  }

  // vocabulary at controlled edit distances from the query 'stram':
  //   stream (insert e -> 1), strap (sub -> 1), strand (2), words (>2)
  private val corpus = Seq(
    turn("c0", 0, "stream words appear right here"),
    turn("c1", 0, "strap holds things quite nicely"),
    turn("c2", 0, "stream strap strand words"),
    turn("c3", 0, "strand cable runs along"),
    turn("c4", 0, "unrelated content entirely present"),
    turn("c5", 0, ""))

  private lazy val idxDir: String = {
    val dir = tmpDir("graft-fuzzy-idx")
    IndexBuilder.build(spark, spark.createDataset(corpus), dir)
    dir
  }
  private lazy val searcher = new Searcher(spark, new IndexStore(idxDir))

  private def brute(word: String, maxEdits: Int): Map[DocKey, Long] =
    corpus.flatMap { t =>
      val n = Tokenizer.tokens(t.text).distinct
        .count(tok => lev(tok, word) <= maxEdits)
      if (n > 0) Some(DocKey(t.conv_id, t.turn_idx) -> n.toLong) else None
    }.toMap

  private def engine(word: String, maxEdits: Int): Map[DocKey, Long] =
    searcher.searchFuzzy(word, maxEdits).collect().map {
      case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n
    }.toMap

  test("searchFuzzy maxEdits=1 (neighborhood probe) matches brute force") {
    for (w <- Seq("stram", "strap", "stream", "wordz", "zzzzz"))
      assert(engine(w, 1) == brute(w, 1), s"word=$w")
  }

  test("searchFuzzy maxEdits=2 (levenshtein dict scan) matches brute force") {
    for (w <- Seq("stram", "strnd", "wordz"))
      assert(engine(w, 2) == brute(w, 2), s"word=$w")
  }

  test("searchFuzzy rejects malformed input") {
    assert(searcher.searchFuzzy("", 1).isEmpty)
    assert(searcher.searchFuzzy("str4m", 1).isEmpty)
    assert(searcher.searchFuzzy("stram", 0).isEmpty)
    assert(searcher.searchFuzzyBm25("STRAM", 5).isEmpty)
  }

  test("searchRegex matches brute force; invalid pattern is empty") {
    for (pat <- Seq("^str", "am$", "a.d", "^zzz$")) {
      val re = pat.r
      val exp = corpus.flatMap { t =>
        val n = Tokenizer.tokens(t.text).distinct
          .count(tok => re.findFirstIn(tok).isDefined)
        if (n > 0) Some(DocKey(t.conv_id, t.turn_idx) -> n.toLong) else None
      }.toMap
      val got = searcher.searchRegex(pat).collect().map {
        case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n
      }.toMap
      assert(got == exp, s"pattern=$pat")
    }
    assert(searcher.searchRegex("[unclosed").isEmpty)
    assert(searcher.searchRegex("").isEmpty)
  }

  test("suggest: df-ranked prefix completion off the dictionary only") {
    // dictionary truth from brute force over the corpus
    val df = corpus.flatMap(t => Tokenizer.tokens(t.text).distinct
        .map(tok => (tok, (t.conv_id, t.turn_idx))))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val exp = df.filter(_._1.startsWith("str")).toSeq
      .sortBy { case (t, d) => (-d, t) }.take(3)
    val got = searcher.suggest("str", 3).collect()
      .map { case Row(t: String, d: Long) => (t, d) }.toSeq
    assert(got == exp)
    assert(got.nonEmpty)
    assert(searcher.suggest("", 3).isEmpty)
    assert(searcher.suggest("St4", 3).isEmpty)
    assert(searcher.suggest("str", 0).isEmpty)
  }

  test("searchFuzzyBm25 equals the exact OR query of the matched words") {
    // 'stram' fuzzy-matches exactly {stream, strap}: scoring through the
    // fuzzy WAND path must be row-identical (scores included) to the
    // pure-OR exact query of those words through searchBm25
    val fuzzy = searcher.searchFuzzyBm25("stram", k = 10).collect().toSeq
    val exact = searcher.searchBm25(""""stream" "strap"""", k = 10)
      .collect().toSeq
    assert(fuzzy == exact)
    assert(fuzzy.nonEmpty)
  }
}
