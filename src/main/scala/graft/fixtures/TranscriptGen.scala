package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Turn

/** Deterministic synthetic transcript corpus (FIXTURES.md).
  *
  * All generation is a pure function of the conversation number (per-conv
  * `scala.util.Random` seeded with `42 ^ convNo`), so the driver-local form
  * (unit tests / oracle) and the distributed form (`spark.range(n).flatMap`)
  * produce byte-identical corpora — and generation scales to any size with
  * no driver materialization and no external data.
  *
  * The vocabulary is engineered to hit every tokenizer / search branch from
  * SURVEY.md §2/§7.1: shared-prefix 5-14 char words, hot stopword-like terms
  * (skew path), 4-char trailing-token-only words, 15-19 char trailing-only
  * words, never-indexed junk, mixed case + accents, digit/punct runs, empty
  * and whitespace-only turns, and one globally unique word in a known turn.
  */
object TranscriptGen {

  private val Base = Timestamp.valueOf("2026-01-01 00:00:00")

  // 5-14 char words with shared prefixes → wildcard-prefix + exact branches.
  private val common = Array(
    "which", "whichever", "would", "wouldst", "there", "therefore",
    "people", "person", "search", "searching", "index", "indexing",
    "spark", "sparkle", "query", "queries", "token", "tokenizer",
    "merge", "merging", "shuffle", "partition", "cluster", "executor",
    "transcript", "conversation")
  // hot terms in >50% of turns → skew / long-posting path.
  private val hot = Array("assistant", "message")
  // 4-char words: indexed only as trailing token; wildcard-unmatchable
  // (min_char_for_match quirk, SURVEY.md §7.1.4).
  private val four = Array("word", "cats")
  // 15-19 chars: trailing-token-only indexing branch.
  private val long1519 = Array("internationaliz", "characterization", "straightforwardly")
  // never indexed: >19 or <4 after folding; plus accents and punct runs.
  private val junk = Array("abcdefghijklmnopqrstuvwxyz", "ab", "the", "a",
    "Äpfel", "naïve", "FAÇADE", "12345", "foo-bar!?", "x_y_z")

  val UniqueWord = "zyxwvutsrqp" // exactly one known turn: conv 0, turn 1

  def convId(convNo: Long): String = f"conv-$convNo%06d"

  /** All turns of one conversation; pure in convNo. */
  def genConv(convNo: Long): Seq[Turn] = {
    val rnd = new scala.util.Random(42L ^ convNo)
    val nTurns = 2 + (convNo % 9).toInt
    val id = convId(convNo)
    (0 until nTurns).map { t =>
      val roles = Array("user", "assistant", "tool")
      val role = roles(t % 3)
      val tool = if (role == "tool") s"tool_${rnd.nextInt(4)}" else null
      val sb = new StringBuilder
      val nWords = 3 + rnd.nextInt(18)
      var w = 0
      while (w < nWords) {
        val r = rnd.nextInt(100)
        val word =
          if (r < 55) common(rnd.nextInt(common.length))
          else if (r < 75) hot(rnd.nextInt(hot.length))
          else if (r < 82) four(rnd.nextInt(four.length))
          else if (r < 86) long1519(rnd.nextInt(long1519.length))
          else junk(rnd.nextInt(junk.length))
        sb.append(word)
        if (w < nWords - 1) sb.append(if (rnd.nextInt(10) == 0) ", " else " ")
        w += 1
      }
      val text0 = sb.toString
      val text =
        if (convNo == 0 && t == 1) text0 + " " + UniqueWord
        else if (convNo % 37 == 5 && t == 0) "" // empty-text turn
        else if (convNo % 37 == 6 && t == 0) "   \t  " // whitespace-only
        else text0
      Turn(id, t, role, text, tool,
        new Timestamp(Base.getTime + (convNo * 97 + t) * 1000L))
    }
  }

  /** Driver-local corpus (tests / oracle). */
  def local(nConvs: Int): Seq[Turn] = (0L until nConvs.toLong).flatMap(genConv)

  /** Distributed corpus — same content as [[local]] for the same nConvs. */
  def dataset(spark: SparkSession, nConvs: Long,
      partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, nConvs, 1L, partitions)
               else spark.range(nConvs)
    base.as[Long].flatMap(genConv _)
  }

  /** Second batch for merge tests: conversations [n, n+extra) are new;
    * conversations [0, overlap) get re-issued turn 0 with CHANGED text plus
    * one appended turn — exercising the reference's additive merge semantics
    * (stale postings survive re-index; word_count overwritten,
    * reference: app/Index/Index_Merge.cpp:617-737). */
  def batch2(nConvs: Long, extra: Long, overlap: Int): Seq[Turn] = {
    val news = (nConvs until nConvs + extra).flatMap(genConv)
    val upd = (0 until overlap).flatMap { c =>
      val id = convId(c.toLong)
      val nTurns = 2 + (c % 9)
      Seq(
        Turn(id, 0, "user", "rewritten fresh contents therefore sparkle", null,
          new Timestamp(Base.getTime + (c * 97L + 500) * 1000L)),
        Turn(id, nTurns, "assistant", "appended closing message wouldst", null,
          new Timestamp(Base.getTime + (c * 97L + 501) * 1000L)))
    }
    news ++ upd
  }

  def batch2Dataset(spark: SparkSession, nConvs: Long, extra: Long,
      overlap: Int): Dataset[Turn] = {
    import spark.implicits._
    spark.createDataset(batch2(nConvs, extra, overlap))
  }

  // ---- benchmark corpus ----------------------------------------------------

  /** Deterministic zipfian vocabulary for benchmark corpora: ~10k distinct
    * 5-12 char words (realistic dictionary cardinality, unlike the tiny
    * test vocabulary above), rank-skewed so hot terms exercise the salting
    * path while the long tail exercises dictionary scale. */
  private val BenchVocabSize = 10000
  private def benchWord(rank: Int): String = {
    val rnd = new scala.util.Random(7919L * (rank + 1))
    val len = 5 + rnd.nextInt(8)
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(('a' + rnd.nextInt(26)).toChar); i += 1 }
    sb.toString
  }
  private lazy val benchVocab: Array[String] =
    (0 until BenchVocabSize).map(benchWord).toArray

  /** One bench conversation — pure in convNo (same determinism contract as
    * [[genConv]]); ~6.5 turns × ~18 zipf-drawn words. */
  def benchConv(convNo: Long): Seq[Turn] = {
    val rnd = new scala.util.Random(1046527L ^ convNo)
    val nTurns = 2 + (convNo % 9).toInt
    val id = convId(convNo)
    (0 until nTurns).map { t =>
      val role = Seq("user", "assistant", "tool")(t % 3)
      val nWords = 10 + rnd.nextInt(16)
      val sb = new StringBuilder(nWords * 9)
      var w = 0
      while (w < nWords) {
        // zipf-ish rank draw: rank = vocab * u^3 skews mass to low ranks
        val u = rnd.nextDouble()
        val rank = math.min(BenchVocabSize - 1,
          (BenchVocabSize * u * u * u).toInt)
        sb.append(benchVocab(rank))
        if (w < nWords - 1) sb.append(' ')
        w += 1
      }
      Turn(id, t, role, sb.toString, null,
        new Timestamp(Base.getTime + (convNo * 97 + t) * 1000L))
    }
  }

  /** Distributed bench corpus. */
  def benchDataset(spark: SparkSession, nConvs: Long,
      partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, nConvs, 1L, partitions)
               else spark.range(nConvs)
    base.as[Long].flatMap(benchConv _)
  }
}
