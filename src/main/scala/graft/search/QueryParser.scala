package graft.search

import scala.collection.mutable.ArrayBuffer

import graft.tokenize.CharFold

/** Query parsing + boolean evaluation replicating the reference's
  * `Search::query_search` (reference: app/Search/Search.cpp:24-342) —
  * including its quirks — generically over a result algebra so the
  * in-memory oracle and the Spark engine share one semantics:
  *
  *   - query must start '(' and end ')' with balanced parens (Search.cpp:30-49);
  *   - '"'-quoted → exact term, length 3..253; unquoted → wildcard term,
  *     length 4..253 (Search.cpp:57-97); `and`/`or`/`not` (case-folded) are
  *     operators; `exactMatch=true` stores every term as exact — which (as in
  *     the reference) makes unquoted term references unresolvable in the
  *     second pass (lookup with exact=false, Search.cpp:137-138);
  *   - terms deduped + sorted (Search.cpp:102-104);
  *   - evaluation is left-to-right, parens only, with default operator OR;
  *     OR adds counts, AND intersects adding counts, NOT erases docs; an OR
  *     token is skipped without resetting a pending operator
  *     (Search.cpp:162-199 — "x AND OR y" behaves like "x AND y").
  */
object QueryParser {

  sealed trait Item
  case object Open extends Item
  case object Close extends Item
  final case class TermRef(idx: Int) extends Item
  final case class OpItem(op: Int) extends Item // 0 OR, 1 AND, 2 NOT

  final val OR = 0; final val AND = 1; final val NOT = 2

  /** A parsed query: the deduped sorted term list (term, isExact) and the
    * flat item stream for evaluation. `valid=false` reproduces the
    * reference's silent empty result for malformed queries. */
  final case class Parsed(valid: Boolean,
      searchWords: Vector[(String, Boolean)], items: Vector[Item]) {

    /** The literal reference reduction (Search.cpp:144-281). */
    def eval[R](alg: ResultAlgebra[R]): Option[R] = {
      if (!valid) return None
      sealed trait SI
      case class SOpen() extends SI
      case class SSub(r: R) extends SI
      case class STerm(i: Int) extends SI
      case class SOp(op: Int) extends SI
      val table = ArrayBuffer.empty[SI]
      for (item <- items) item match {
        case Open => table += SOpen()
        case TermRef(i) => table += STerm(i)
        case OpItem(op) => table += SOp(op)
        case Close =>
          if (table.isEmpty) return None
          var openAt = 0
          var j = table.length - 1
          var found = false
          while (j >= 0 && !found) {
            if (table(j).isInstanceOf[SOpen]) { openAt = j; found = true }
            j -= 1
          }
          var temp = alg.empty
          var counter = 0
          var op = OR
          var idx = openAt
          while (idx < table.length) {
            val it = table(idx)
            // first-operand / skipped-OR branch (Search.cpp:161-196)
            val isOrTok = it match { case SOp(OR) => true; case _ => false }
            var skipped = false
            if (counter == 0 || isOrTok) {
              it match {
                case SSub(r) => temp = alg.or(temp, r)
                case STerm(i) => temp = alg.or(temp, alg.term(i))
                case SOp(_) => skipped = true // `continue` in the reference
                case SOpen() => ()
              }
              if (!skipped) op = OR
            }
            if (!skipped) {
              it match {
                case SOp(o) => op = o
                case SSub(r) =>
                  temp = applyOp(alg, op, temp, r); op = OR
                case STerm(i) =>
                  // counter==0 fall-through double-apply is unreachable for
                  // validated queries (position openAt is always an Open);
                  // guard to keep semantics sane regardless.
                  if (counter != 0) { temp = applyOp(alg, op, temp, alg.term(i)); op = OR }
                case SOpen() => ()
              }
              counter += 1
            }
            idx += 1
          }
          table.remove(openAt, table.length - openAt)
          table += SSub(temp)
      }
      table.headOption.collect { case SSub(r) => r }
    }

    private def applyOp[R](alg: ResultAlgebra[R], op: Int, acc: R, x: R): R =
      op match {
        case OR => alg.or(acc, x)
        case AND => alg.and(acc, x)
        case NOT => alg.not(acc, x)
      }
  }

  private def isOperatorWord(w: String): Boolean =
    w == "and" || w == "or" || w == "not"

  /** Parse `query` (already wrapped in outer parens by the caller, as
    * `Search::search` does at Search.cpp:345-346). */
  def parse(query: String, exactMatch: Boolean = false): Parsed = {
    // -- validation (Search.cpp:30-49)
    if (query.isEmpty || query.head != '(' || query.last != ')')
      return Parsed(valid = false, Vector.empty, Vector.empty)
    var depth = 0
    for (c <- query) {
      if (c == '(') depth += 1
      if (c == ')') depth -= 1
      if (depth < 0) return Parsed(valid = false, Vector.empty, Vector.empty)
    }
    if (depth != 0) return Parsed(valid = false, Vector.empty, Vector.empty)

    // -- pass 1: extract search words (Search.cpp:51-104)
    val words = ArrayBuffer.empty[(String, Boolean)]
    var cur = new StringBuilder
    var inExact = false
    for (c <- query) {
      if (c == '"') {
        if (inExact) {
          if (cur.length > 2 && cur.length < 254) {
            words += ((cur.toString, true)); cur.clear(); inExact = false
          }
        } else inExact = true
      } else {
        val f = CharFold.fold(c)
        if (f == CharFold.Sep) {
          val w = cur.toString
          if (isOperatorWord(w)) cur.clear()
          else if (w.length > 3 && w.length < 254) {
            words += ((w, exactMatch)); cur.clear()
          }
          // NOTE (reference parity): a token that ends at a separator with
          // length outside 4..253 is NOT cleared in the reference either —
          // it keeps accumulating (Search.cpp:70-88 clears only on accept).
        } else cur.append(f)
      }
    }
    if (cur.length > 3 && cur.length < 254 && !isOperatorWord(cur.toString))
      words += ((cur.toString, exactMatch))
    val searchWords = words.distinct.sorted.toVector

    // -- pass 2: item stream (Search.cpp:121-334)
    val items = ArrayBuffer.empty[Item]
    cur = new StringBuilder
    inExact = false
    def flushUnquoted(): Unit = {
      val w = cur.toString
      if (isOperatorWord(w)) {
        items += OpItem(if (w == "and") AND else if (w == "or") OR else NOT)
        cur.clear()
      } else if (w.length > 3 && w.length < 254) {
        val i = searchWords.indexOf((w, false)) // literal: always exact=false
        if (i >= 0) items += TermRef(i)
        cur.clear()
      }
    }
    var i = 0
    while (i < query.length) {
      val c = query.charAt(i)
      if (c == '(') { items += Open }
      else if (c == ')') { flushUnquoted(); items += Close }
      else if (c == '"') {
        if (inExact) {
          if (cur.length > 2 && cur.length < 254) {
            val w = cur.toString
            val idx = searchWords.indexOf((w, true))
            if (idx >= 0) items += TermRef(idx)
            cur.clear(); inExact = false
          }
        } else inExact = true
      } else {
        val f = CharFold.fold(c)
        if (f != CharFold.Sep) cur.append(f)
        else flushUnquoted()
      }
      i += 1
    }
    Parsed(valid = true, searchWords, items.toVector)
  }
}

/** Result algebra: how per-term doc→value results combine under the
  * reference's boolean semantics. Implemented over in-memory maps (oracle)
  * and over DataFrames (engine). */
trait ResultAlgebra[R] {
  def empty: R
  /** Result for search word index i (doc → count or doc → score). */
  def term(i: Int): R
  /** OR: union, values summed (Search.cpp:200-205,226-237). */
  def or(acc: R, x: R): R
  /** AND: intersect, values summed (Search.cpp:206-217,238-258). */
  def and(acc: R, x: R): R
  /** NOT: erase x's docs from acc (Search.cpp:218-223,259-265). */
  def not(acc: R, x: R): R
}
