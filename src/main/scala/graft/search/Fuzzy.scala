package graft.search

/** Edit-distance-1 neighborhood generation over the engine alphabet
  * ([a-z] — [[graft.tokenize.CharFold]] folds everything else to
  * separators, so no dictionary term can contain other characters), the
  * SymSpell-flavored driver-side expansion behind
  * [[Searcher.searchFuzzy]].
  *
  * Why generate-then-probe instead of scanning the dictionary with an
  * edit-distance predicate: the 1-edit neighborhood of a word of length n
  * is bounded by 52n + 27 strings (n deletions, 25n substitutions,
  * 26(n+1) insertions, the word itself) BEFORE dedup — a few hundred
  * literals for any legal term, independent of corpus size. Probing those
  * as exact dictionary keys keeps the dictionary scan letter-pruned and
  * parquet-min/max-skippable exactly like an exact-term query, and the
  * postings scan gets the same pushed predicates: the 100-TB plan is
  * identical to a |neighborhood|-term OR query, never a vocabulary scan.
  * (maxEdits >= 2 neighborhoods grow ~quadratically with 26^2 branching,
  * so [[Searcher.searchFuzzy]] falls back to a dictionary scan with
  * Spark's bounded `levenshtein(l, r, threshold)` — the dictionary is
  * vocabulary-sized, sublinear in corpus size, so that scan stays bounded
  * too; it just loses the letter pruning.)
  */
object Fuzzy {

  /** All strings within edit distance <= 1 of `word` over [a-z]
    * (including `word` itself), filtered to `minLen..maxLen`, distinct,
    * sorted — a deterministic probe list makes the dictionary predicate
    * (and therefore the physical plan) stable across runs. */
  def neighborhood1(word: String, minLen: Int = 4, maxLen: Int = 19)
      : Seq[String] = {
    val out = scala.collection.mutable.SortedSet.empty[String]
    def keep(w: String): Unit =
      if (w.length >= minLen && w.length <= maxLen) out += w
    keep(word)
    var i = 0
    while (i < word.length) {
      keep(word.substring(0, i) + word.substring(i + 1)) // deletion at i
      var c = 'a'
      while (c <= 'z') { // substitution at i
        if (c != word.charAt(i))
          keep(word.substring(0, i) + c + word.substring(i + 1))
        c = (c + 1).toChar
      }
      i += 1
    }
    i = 0
    while (i <= word.length) { // insertion before i
      var c = 'a'
      while (c <= 'z') {
        keep(word.substring(0, i) + c + word.substring(i))
        c = (c + 1).toChar
      }
      i += 1
    }
    out.toSeq
  }
}
