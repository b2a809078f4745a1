package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{DocKey, EngineConf}
import graft.search.QueryParser
import graft.verify.Oracle
import graft.model.Turn

/** Query parsing + boolean semantics against hand-computed expectations
  * (reference: app/Search/Search.cpp). */
class QueryParserSpec extends AnyFunSuite {

  test("validation: must be parenthesized and balanced") {
    assert(!QueryParser.parse("which").valid)
    assert(!QueryParser.parse("(which").valid)
    assert(!QueryParser.parse("which)").valid)
    assert(!QueryParser.parse("())(").valid)
    assert(QueryParser.parse("(which)").valid)
  }

  test("term extraction: quoted exact 3..253, unquoted wildcard 4..253") {
    val p = QueryParser.parse("""(which "abc" ab "xy" word)""")
    assert(p.searchWords.contains(("which", false)))
    assert(p.searchWords.contains(("abc", true)))   // quoted, 3 chars ok
    assert(p.searchWords.contains(("word", false))) // 4 chars ok unquoted
    assert(!p.searchWords.contains(("xy", true)))   // 2 chars too short
    // NOTE reference parity: unaccepted fragments accumulate ("ab" glues
    // into the next token) — so ("ab", false) alone must not appear
    assert(!p.searchWords.exists(_._1 == "ab"))
  }

  test("operators are case-insensitive and never terms") {
    val p = QueryParser.parse("(which AND would OR there NOT people)")
    assert(p.searchWords.map(_._1).toSet == Set("which", "would", "there", "people"))
    val ops = p.items.collect { case QueryParser.OpItem(o) => o }
    assert(ops == Vector(QueryParser.AND, QueryParser.OR, QueryParser.NOT))
  }

  test("terms are deduped and sorted") {
    val p = QueryParser.parse("(zebra apple zebra \"apple\")")
    assert(p.searchWords == Vector(("apple", false), ("apple", true), ("zebra", false)))
  }

  private def mkOracle: Oracle = {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    new Oracle(EngineConf.default).indexAll(Seq(
      Turn("c1", 0, "user", "apple banana cherry", null, ts),
      Turn("c1", 1, "user", "apple apple dragon", null, ts),
      Turn("c2", 0, "user", "banana dragon elder", null, ts),
      Turn("c2", 1, "user", "cherry cherry cherry", null, ts)))
  }

  test("single wildcard term counts distinct matched words per doc") {
    val o = mkOracle
    // 'apple' matches only word 'apple' (prefix, len 5 > 4)
    val r = o.searchCount("apple").toMap
    assert(r == Map(DocKey("c1", 0) -> 1L, DocKey("c1", 1) -> 1L))
  }

  test("wildcard length quirk: 4-char wildcard matches nothing") {
    val o = new Oracle(EngineConf.default).indexAll(Seq(
      Turn("c1", 0, "user", "wordy word", null,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))))
    // 'word' extracted (len 4 ≥ 4) but wildcard match needs len ≥ 5
    assert(o.searchCount("word").isEmpty)
    // exact match is unaffected by the quirk
    assert(o.searchCount("\"word\"").nonEmpty)
    // 5-char wildcard matches by prefix
    assert(o.searchCount("wordy").toMap == Map(DocKey("c1", 0) -> 1L))
  }

  test("AND intersects and sums counts") {
    val o = mkOracle
    val r = o.searchCount("(apple AND banana)").toMap
    assert(r == Map(DocKey("c1", 0) -> 2L))
  }

  test("OR unions and sums counts; adjacency defaults to OR") {
    val o = mkOracle
    val r1 = o.searchCount("(apple OR banana)").toMap
    val r2 = o.searchCount("(apple banana)").toMap
    assert(r1 == r2)
    assert(r1 == Map(DocKey("c1", 0) -> 2L, DocKey("c1", 1) -> 1L, DocKey("c2", 0) -> 1L))
  }

  test("NOT erases docs") {
    val o = mkOracle
    val r = o.searchCount("(banana NOT dragon)").toMap
    assert(r == Map(DocKey("c1", 0) -> 1L))
  }

  test("nested parens, left-to-right, no precedence") {
    val o = mkOracle
    // (apple OR elder) AND cherry → {c1t0:1, c1t1:1, c2t0:1} AND {c1t0, c2t1}
    val r = o.searchCount("((apple OR elder) AND cherry)").toMap
    assert(r == Map(DocKey("c1", 0) -> 2L))
    // no precedence: apple OR elder AND cherry = ((apple OR elder) AND cherry)
    val r2 = o.searchCount("(apple OR elder AND cherry)").toMap
    assert(r2 == r)
  }

  test("reference quirk: OR token does not reset a pending operator") {
    val o = mkOracle
    // "apple AND OR banana" behaves like "apple AND banana"
    val r = o.searchCount("(apple AND OR banana)").toMap
    assert(r == o.searchCount("(apple AND banana)").toMap)
  }

  test("nonexistent term yields empty") {
    assert(mkOracle.searchCount("xyzzyqwkplm").isEmpty)
  }

  test("exactMatch config: unquoted terms stored exact, dropped by the " +
       "reference's second-pass (word,false) lookup — literal parity") {
    val o = new Oracle(EngineConf.default.copy(exactMatch = true))
    o.indexAll(Seq(Turn("c1", 0, "user", "apple pie crust", null,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))))
    assert(o.searchCount("apple").isEmpty) // dropped by (word,false) lookup
    assert(o.searchCount("\"apple\"").nonEmpty) // quoted still works
  }

  test("ranking: count desc, then conv_id, then turn_idx") {
    val o = mkOracle
    val r = o.searchCount("(apple OR banana OR cherry OR dragon)")
    assert(r.map(_._2) == r.map(_._2).sorted.reverse)
    val grouped = r.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    grouped.foreach { case (_, docs) =>
      assert(docs == docs.sortBy(d => (d.conv_id, d.turn_idx)))
    }
  }
}
