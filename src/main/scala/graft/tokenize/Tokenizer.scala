package graft.tokenize

import scala.collection.mutable

/** Tokenization replicating the reference's `indexer::get_words_utf8` word
  * loop (reference: app/Indexer/Indexer.cpp:59-91):
  *
  *   - chars folded via [[CharFold]]; '!' is the separator;
  *   - interior tokens kept iff `len > 4 && len < 15`  (5..14 chars);
  *   - the FINAL token of a text kept iff `len > 3 && len < 20` (4..19 chars)
  *     — the reference applies the looser rule only when scanning reached the
  *     end of the file (Indexer.cpp:84-88); for transcripts every turn text is
  *     a complete "file", so the final-token rule always applies to the last
  *     token.
  *
  * The reference inserts tokens into an `unordered_set` (tf discarded,
  * Indexer.cpp:77); the north star keeps tf for BM25, so [[stats]] returns
  * both the tf map and the reference-parity distinct count.
  */
object Tokenizer {

  /** End-of-body marker: flushes the pending token with the FINAL rule
    * (4..19) and continues tokenizing. [[graft.sources.FileCorpus]] appends
    * `FileEnd + filename` to a file's body so ONE text carries the
    * reference's two independently-finalized token streams (body words at
    * EOF + filename words, reference app/Indexer/Indexer.cpp:84-111): the
    * body's last word keeps its end-of-file rule and the filename's last
    * word gets its own. U+0000 never occurs in real text; a text without the
    * marker tokenizes exactly as before. */
  final val FileEnd: Char = '\u0000'

  /** All kept tokens in order of appearance (with duplicates → tf). */
  def tokens(text: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]()
    if (text == null) return out
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == FileEnd) {
        val len = sb.length
        if (len > 3 && len < 20) out += sb.toString // final rule mid-stream
        sb.setLength(0)
      } else {
        val f = CharFold.fold(c)
        if (f == CharFold.Sep) {
          val len = sb.length
          if (len > 4 && len < 15) out += sb.toString
          sb.setLength(0)
        } else sb.append(f)
      }
      i += 1
    }
    val len = sb.length
    if (len > 3 && len < 20) out += sb.toString // final-token rule
    out
  }

  /** Distinct token set (exact reference semantics, Indexer.cpp:60,77,88). */
  def tokenSet(text: String): Set[String] = tokens(text).toSet

  /** Per-turn stats in one pass: term→tf, dl (total kept tokens) and
    * word_count (distinct kept terms, the reference's per-doc count,
    * app/LocalIndex/LocalIndex.cpp:72-73). */
  final case class TurnTokens(tf: mutable.LinkedHashMap[String, Int], dl: Int) {
    def wordCount: Int = tf.size
  }

  def stats(text: String): TurnTokens = {
    // fused single pass (no intermediate token buffer): this is the map-side
    // hot path of the index build
    val m = new mutable.LinkedHashMap[String, Int]()
    var dl = 0
    if (text == null) return TurnTokens(m, dl)
    @inline def keep(t: String): Unit = {
      m.updateWith(t) { case Some(c) => Some(c + 1); case None => Some(1) }
      dl += 1
    }
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == FileEnd) {
        val len = sb.length
        if (len > 3 && len < 20) keep(sb.toString) // final rule mid-stream
        sb.setLength(0)
      } else {
        val f = CharFold.fold(c)
        if (f == CharFold.Sep) {
          val len = sb.length
          if (len > 4 && len < 15) keep(sb.toString)
          sb.setLength(0)
        } else sb.append(f)
      }
      i += 1
    }
    val len = sb.length
    if (len > 3 && len < 20) keep(sb.toString) // final-token rule
    TurnTokens(m, dl)
  }
}
