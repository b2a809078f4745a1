package graft.app

import graft.pipeline.{CorpusFilters, Dedup, TextStats}

/** DuckDB oracle SQL for every SQL-expressible entry of
  * [[EntryQueries.all]]. Column names, value arithmetic (integer, decimal,
  * or order-controlled double folds), and row order match the Spark
  * implementations bit-for-bit — see EntryQueries for the determinism
  * rules. Non-expressible queries (LSH probing internals) are omitted →
  * the driver records a rows-only check for them.
  */
object OracleSql {

  // ---- shared fragments ----------------------------------------------------

  /** Whitespace tokens minus empties — mirrors [[TextStats.wsTokens]]. */
  private val WsToks =
    "list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'), x -> x != '')"

  /** Rolling hash (acc*31 + ascii(c)) mod 2^31 of a string expression —
    * mirrors [[TextStats.fingerprintCol]]. */
  private def rollHash(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, [ascii(c) for c in string_split($e, '')]), " +
      s"(a, b) -> (a * 31 + b) % ${TextStats.FpMod})"

  /** Reference-tokenizer CTEs over `documents` (text is `[a-z ]` in the
    * testdata, so char folding reduces to the space separator): interior
    * tokens 5..14 chars, final token 4..19 — mirrors graft.tokenize.Tokenizer. */
  private val FtsTok = """
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ex AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS pos,
                  len(w) AS n
           FROM ws),
    tok AS (SELECT doc_id, word AS term FROM ex
            WHERE (pos < n AND length(word) > 4 AND length(word) < 15)
               OR (pos = n AND length(word) > 3 AND length(word) < 20))"""

  /** Word-3gram distinct shingles + per-doc shingle counts. */
  private val Shingles = s"""
    ws AS (SELECT doc_id, $WsToks AS w FROM documents),
    ex AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
           FROM ws),
    sh3 AS (SELECT doc_id,
                   tok || ' ' || lead(tok, 1) OVER win || ' ' ||
                     lead(tok, 2) OVER win AS shingle
            FROM ex WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
    s AS (SELECT DISTINCT doc_id, shingle FROM sh3 WHERE shingle IS NOT NULL),
    cnt AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1)"""

  /** Span-dedup CTEs for k-token windows (k = [[SpanK]]): positional
    * k-grams per doc, occurrence counting, gaps-and-islands merge of
    * duplicated window starts into maximal spans — mirrors
    * [[graft.pipeline.Dedup.spanDups]] step for step (1-based positions
    * both sides; the CASE's NULL lag collapses to 0 exactly like Spark's
    * `when(...).otherwise(0)`). */
  private val SpanK = 8
  private def spanCtes: String = {
    val leads = (1 until SpanK)
      .map(i => s"lead(tok, $i) OVER win").mkString(" || ' ' || ")
    s"""ws AS (SELECT doc_id, $WsToks AS w FROM documents),
    ex AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
           FROM ws),
    pg AS (SELECT doc_id, pos, tok || ' ' || $leads AS gram
           FROM ex WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
    g2 AS (SELECT doc_id, pos, gram FROM pg WHERE gram IS NOT NULL),
    dupg AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
    dp AS (SELECT doc_id, pos FROM g2 JOIN dupg USING (gram)),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN pos > lag(pos) OVER w + $SpanK THEN 1 ELSE 0 END
                     AS brk
            FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    isl2 AS (SELECT doc_id, pos,
                    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    sp AS (SELECT doc_id, min(pos) AS span_start,
                  max(pos) + $SpanK - min(pos) AS span_len
           FROM isl2 GROUP BY doc_id, island)"""
  }

  /** Exact jaccard >= 80% pairs over the shingle sets (integer threshold). */
  private val JaccardPairs = s"""WITH $Shingles,
    i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT id_a, id_b, inter, (ca.n_sh + cb.n_sh - inter) AS uni
    FROM i JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
    WHERE inter * 100 >= (ca.n_sh + cb.n_sh - inter) * 80
    ORDER BY id_a, id_b"""

  /** The 31-bit signature computation as CTEs ending in `sig` — shared by
    * the signature entry and the incremental-pairs entry. */
  private def simhashCtes: String = {
    val bitSums = (0 until Dedup.SimhashBits).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN tf ELSE -tf END) AS b$i")
      .mkString(", ")
    val assemble = (0 until Dedup.SimhashBits).map(i =>
      s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""t AS (SELECT doc_id, unnest($WsToks) AS w FROM documents),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
      h AS (SELECT doc_id, tf, ${rollHash("w")} AS h FROM tf),
      bits AS (SELECT doc_id, $bitSums FROM h GROUP BY 1),
      sig AS (SELECT doc_id, ($assemble)::BIGINT AS simhash FROM bits)"""
  }

  private def simhashSql: String =
    s"WITH $simhashCtes SELECT doc_id, simhash FROM sig ORDER BY doc_id"

  /** 31-bit SimHash near-dup pairs restricted to the arrival batch
    * (doc_id % 7 = 2): band collision (8/8/8/7 chunks — 31-bit sigs are
    * nonnegative, so // and % mirror the engine's unsigned shift + mask)
    * then Hamming ≤ 3 via xor/bit_count — all integer arithmetic. */
  private def simhashIncSql: String = {
    val bands = Seq((0, 8), (8, 8), (16, 8), (24, 7)).zipWithIndex
      .map { case ((off, len), bi) =>
        s"SELECT doc_id, simhash, $bi AS chunk, " +
          s"(simhash // ${1L << off}) % ${1L << len} AS key FROM sig"
      }.mkString(" UNION ALL ")
    s"""WITH $simhashCtes,
      b AS ($bands),
      c AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                   l.simhash AS sa, r.simhash AS sb
            FROM b l JOIN b r ON l.chunk = r.chunk AND l.key = r.key
              AND l.doc_id < r.doc_id)
      SELECT id_a, id_b, bit_count(xor(sa, sb))::BIGINT AS hamming
      FROM c
      WHERE bit_count(xor(sa, sb)) <= 3 AND (id_a % 7 = 2 OR id_b % 7 = 2)
      ORDER BY id_a, id_b"""
  }

  private def langIdSql: String = {
    val scores = TextStats.LangProfiles.map { case (lang, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($lst, x))) AS s_$lang"
    }.mkString(", ")
    val best = TextStats.LangProfiles.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val pick = TextStats.LangProfiles.map { case (l, _) =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH d AS (SELECT doc_id, list_distinct($WsToks) AS toks FROM documents),
      sc AS (SELECT doc_id, $scores FROM d),
      b AS (SELECT doc_id, *, $best AS best FROM sc)
      SELECT doc_id, CASE $pick ELSE 'und' END AS lang_pred,
             best::BIGINT AS hits
      FROM b ORDER BY doc_id"""
  }

  private val Stop = TextStats.Stopwords.map(w => s"'$w'")
    .mkString("[", ", ", "]")

  /** BM25 constants written as the engine computes them (1.2 + 1.0, not a
    * pre-folded literal) so both engines round identically. */
  private val Bm25Terms = Seq("customer", "stream", "window")
  /** [[FtsTok]] with token positions kept and re-ranked densely over the
    * KEPT stream (`p`): phrase adjacency is adjacency among kept tokens —
    * dropped words do not break a phrase, exactly like a positional index
    * built from the same stream. */
  private val FtsPosTok = """
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ex AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS pos,
                  len(w) AS n
           FROM ws),
    tokp AS (SELECT doc_id, pos, word AS term FROM ex
             WHERE (pos < n AND length(word) > 4 AND length(word) < 15)
                OR (pos = n AND length(word) > 3 AND length(word) < 20)),
    rk AS (SELECT doc_id, term,
                  row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
           FROM tokp)"""

  /** The catalog phrase (folded form; see q_fts_phrase). */
  private val Phrase = "value table"

  /** Phrase-occurrence counts per doc: kept-token bigrams vs the phrase. */
  private val PhraseHits = s"""
    gr AS (SELECT doc_id, term || ' ' || lead(term, 1) OVER win AS gram
           FROM rk WINDOW win AS (PARTITION BY doc_id ORDER BY p)),
    hits AS (SELECT doc_id, count(*) AS cnt FROM gr
             WHERE gram = '$Phrase' GROUP BY 1)"""

  /** Phrase BM25 (one virtual term — a single contribution, so no float
    * sum-order concern; rank-only output like [[bm25Sql]]). */
  private def phraseBm25Sql: String = s"""
    WITH $FtsPosTok,
    $PhraseHits,
    st AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY 1),
    alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
             FROM documents d LEFT JOIN st USING (doc_id)),
    m AS (SELECT count(*)::DOUBLE AS nd,
                 sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
    dfc AS (SELECT count(*)::DOUBLE AS df FROM hits),
    sc AS (SELECT h.doc_id,
        ln(1.0 + (m.nd - dfc.df + 0.5) / (dfc.df + 0.5)) *
          ((h.cnt::DOUBLE * (1.2 + 1.0)) /
           (h.cnt::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS score
        FROM hits h JOIN alld a USING (doc_id) CROSS JOIN m CROSS JOIN dfc)
    SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
    FROM sc ORDER BY score DESC, doc_id LIMIT 20"""

  /** `hitsPred` restricts the RANKED set only (the tombstone-masked phase:
    * live docs keep full-corpus statistics — the Lucene staleness
    * contract); `corpusPred` restricts the corpus the statistics are
    * computed FROM (the post-compaction phase: purged docs influence
    * nothing). TRUE/TRUE is the plain q_fts_bm25 oracle. */
  private def bm25Sql(hitsPred: String = "TRUE",
      corpusPred: String = "TRUE"): String = {
    val in = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH
      ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
             WHERE $corpusPred),
      ex AS (SELECT doc_id, unnest(w) AS word,
                    generate_subscripts(w, 1) AS pos, len(w) AS n
             FROM ws),
      tok AS (SELECT doc_id, word AS term FROM ex
              WHERE (pos < n AND length(word) > 4 AND length(word) < 15)
                 OR (pos = n AND length(word) > 3 AND length(word) < 20)),
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)
               WHERE $corpusPred),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN $in GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE term IN $in GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      sc AS (SELECT doc_id,
                    list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY term)),
                                (x, y) -> x + y) AS score
             FROM contrib GROUP BY doc_id)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc WHERE $hitsPred ORDER BY score DESC, doc_id LIMIT 20"""
  }

  /** More-like-this: seed doc 42's top-3 terms by tf·idf (tie: term asc)
    * become the [[bm25Sql]] query; the seed is excluded from the ranking
    * (rank-only output). */
  private def mltSql: String = s"""
    WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      dfall AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
                GROUP BY 1),
      seedtf AS (SELECT term, count(*)::DOUBLE AS tf FROM tok
                 WHERE doc_id = 42 GROUP BY 1),
      chosen AS (SELECT s.term,
                        s.tf * ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) AS sel
                 FROM seedtf s JOIN dfall f USING (term) CROSS JOIN m
                 ORDER BY sel DESC, s.term LIMIT 3),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN (SELECT term FROM chosen) GROUP BY 1, 2),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN dfall f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      sc AS (SELECT doc_id,
                    list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY term)),
                                (x, y) -> x + y) AS score
             FROM contrib GROUP BY doc_id)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc WHERE doc_id <> 42 ORDER BY score DESC, doc_id LIMIT 20"""

  /** BM25 of (~custmer AND "stream"): the fuzzy virtual term's summed
    * contribution (term-ordered reduce — single-match here, so the
    * engine's unordered sum agrees bit-for-bit) + the word score; two-
    * operand IEEE addition commutes, rank-only output. */
  private def fuzzyBoolBm25Sql: String = s"""
    WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE levenshtein(term, 'custmer') <= 1 OR term = 'stream'
             GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE levenshtein(term, 'custmer') <= 1 OR term = 'stream'
             GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      cf AS (SELECT doc_id,
                    list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY term)),
                                (x, y) -> x + y) AS c
             FROM contrib WHERE levenshtein(term, 'custmer') <= 1
             GROUP BY doc_id),
      cs AS (SELECT doc_id, c FROM contrib WHERE term = 'stream'),
      andres AS (SELECT cf.doc_id, cf.c + cs.c AS score
                 FROM cf JOIN cs USING (doc_id))
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM andres ORDER BY score DESC, doc_id LIMIT 20"""

  /** Fuzzy BM25: the [[bm25Sql]] arithmetic with the term set defined by
    * edit distance <= 1 of the misspelled query word (rank-only output;
    * contributions reduce in term-sorted order like [[bm25Sql]]). */
  private def fuzzyBm25Sql: String = s"""
    WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE levenshtein(term, 'custmer') <= 1 GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE levenshtein(term, 'custmer') <= 1 GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      sc AS (SELECT doc_id,
                    list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY term)),
                                (x, y) -> x + y) AS score
             FROM contrib GROUP BY doc_id)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc ORDER BY score DESC, doc_id LIMIT 20"""

  /** Boolean-structured BM25: ("customer" AND "stream") OR windo-prefix.
    * Every score is built from sums of at most two doubles (IEEE addition
    * of two operands is order-independent), so the oracle is bit-exact. */
  private def bm25BoolSql: String = {
    s"""WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN ('customer', 'stream', 'window') GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE term IN ('customer', 'stream', 'window') GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      ca AS (SELECT doc_id, c FROM contrib WHERE term = 'customer'),
      cs AS (SELECT doc_id, c FROM contrib WHERE term = 'stream'),
      cw AS (SELECT doc_id, c FROM contrib WHERE term = 'window'),
      andres AS (SELECT ca.doc_id, ca.c + cs.c AS v
                 FROM ca JOIN cs USING (doc_id)),
      orres AS (SELECT coalesce(andres.doc_id, cw.doc_id) AS doc_id,
                       coalesce(andres.v, 0.0) + coalesce(cw.c, 0.0) AS score
                FROM andres FULL OUTER JOIN cw
                  ON andres.doc_id = cw.doc_id)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM orres ORDER BY score DESC, doc_id LIMIT 20"""
  }

  /** Exact double cosine with the same left-fold order as the Spark side. */
  private val EmbNorm =
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding, " +
      "x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b)"
  private def embDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip($a, $b), " +
      s"p -> p[1]::DOUBLE * p[2]::DOUBLE)), (x, y) -> x + y)"

  private def annBruteSql: String = s"""
    WITH e AS (SELECT vec_id, embedding, $EmbNorm AS n2 FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, n2 AS qn
          FROM e WHERE vec_id < 5),
    sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  ${embDot("q.qv", "e.embedding")} / (sqrt(q.qn) * sqrt(e.n2)) AS cos
           FROM q, e WHERE e.vec_id != q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rnk
          FROM sc)
    SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 10
    ORDER BY query_id, rnk"""

  // ---- catalog -------------------------------------------------------------

  val all: Map[String, String] = Map(

    "q_agg_pushdown" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_filter_scan" -> """
      SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
      WHERE o_totalprice > 300000.0 AND o_orderstatus = 'O'
      ORDER BY o_orderkey""",

    "q_join_broadcast" -> """
      SELECT r_name, n_name, count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_join_agg" -> """
      SELECT o_orderpriority, count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1""",

    "q_join_multi" -> """
      SELECT p_brand, count(*) AS n_lines,
             count(DISTINCT s_nationkey) AS n_supp_nations,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1 ORDER BY 1""",

    "q_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q_semi_join" -> """
      SELECT c_mktsegment, count(*) AS n_active FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1 ORDER BY 1""",

    "q_anti_join" -> """
      SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q_window_topn" -> """
      SELECT o_custkey, o_orderkey, rnk FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders)
      WHERE rnk <= 3 ORDER BY o_custkey, rnk""",

    "q_topk_global" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q_setops" -> """
      SELECT c_custkey FROM (
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      ORDER BY c_custkey""",

    "q_distinct_agg" -> """
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_events_window" -> """
      SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_start, event_type,
             count(*) AS n, min(value) AS min_value, max(value) AS max_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_events_json" -> """
      SELECT event_type, count(*) AS n,
             sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
             max(json_extract_string(props, '$.k')::BIGINT) AS max_k
      FROM events GROUP BY 1 ORDER BY 1""",

    "q_events_sessions" -> """
      WITH g AS (SELECT user_id,
                        epoch(ts)::BIGINT -
                          lag(epoch(ts)::BIGINT) OVER
                            (PARTITION BY user_id ORDER BY ts) AS gap
                 FROM events)
      SELECT user_id, count(*) AS n_events,
             sum(CASE WHEN gap IS NULL OR gap > 600 THEN 1 ELSE 0 END)::BIGINT
               AS n_sessions
      FROM g GROUP BY 1 ORDER BY 1""",

    // the streaming fold's cumulative totals equal the batch sessionization
    // (restricted to the bounded replay slice, user_id < 100)
    "q_events_sessions_stream" -> """
      WITH g AS (SELECT user_id,
                        epoch(ts)::BIGINT -
                          lag(epoch(ts)::BIGINT) OVER
                            (PARTITION BY user_id ORDER BY ts) AS gap
                 FROM events WHERE user_id < 100)
      SELECT user_id, count(*) AS n_events,
             sum(CASE WHEN gap IS NULL OR gap > 600 THEN 1 ELSE 0 END)::BIGINT
               AS n_sessions
      FROM g GROUP BY 1 ORDER BY 1""",

    "q_text_token_counts" -> s"""
      SELECT doc_id, len($WsToks)::BIGINT AS n_ws_tokens,
             len(regexp_extract_all(coalesce(text, ''),
               '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
               AS n_bpeish_tokens,
             length(coalesce(text, ''))::BIGINT AS n_chars
      FROM documents ORDER BY doc_id""",

    "q_text_quality" -> s"""
      WITH b AS (SELECT doc_id, length(coalesce(text, ''))::BIGINT AS n_chars,
                        $WsToks AS toks,
                        len(regexp_extract_all(coalesce(text, ''),
                          '[^A-Za-z0-9\\s]'))::BIGINT
                          AS n_punct
                 FROM documents),
      c AS (SELECT doc_id, n_chars, len(toks)::BIGINT AS n_tokens,
                   len(list_filter(toks, x -> list_contains($Stop, x)))::BIGINT
                     AS n_stop,
                   n_punct
            FROM b),
      r AS (SELECT *,
                   CASE WHEN n_tokens > 0
                        THEN n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END
                     AS stop_ratio,
                   CASE WHEN n_tokens > 0
                        THEN (n_chars - (n_tokens - 1))::DOUBLE / n_tokens::DOUBLE
                        ELSE 0.0 END AS mean_word_len
            FROM c)
      SELECT doc_id, n_chars, n_tokens, n_stop, n_punct, stop_ratio,
             mean_word_len,
             (n_tokens >= 5 AND n_chars >= 20 AND stop_ratio < 0.5) AS keep
      FROM r ORDER BY doc_id""",

    "q_text_langid" -> langIdSql,

    "q_text_fingerprint" ->
      s"SELECT doc_id, ${rollHash("text")} AS fp FROM documents ORDER BY doc_id",

    // hashing-trick vectors: per kept-token occurrence, bucket (h/2) mod 32
    // and sign from h's low bit — integer arithmetic both engines share
    "q_text_hashvec" -> s"""
      WITH $FtsTok,
      h AS (SELECT doc_id, ${rollHash("term")} AS h FROM tok),
      c AS (SELECT doc_id, (h // 2) % 32 AS idx,
                   CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END AS sgn
            FROM h)
      SELECT doc_id, idx::BIGINT AS idx, sum(sgn)::BIGINT AS val
      FROM c GROUP BY 1, 2 HAVING sum(sgn) <> 0
      ORDER BY doc_id, idx""",

    "q_dedup_exact" -> """
      SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
             count(*) AS n_dups
      FROM documents GROUP BY 1 ORDER BY 1""",

    // arrival-loop keep verdicts: is_new iff first occurrence corpus-wide
    // (no lower-id batch doc and no base doc shares the digest)
    "q_dedup_exact_inc" -> """
      WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS text_hash
                 FROM documents),
      batch AS (SELECT * FROM h WHERE doc_id % 7 = 3),
      firsts AS (SELECT text_hash, min(doc_id) AS first_id
                 FROM batch GROUP BY 1),
      base AS (SELECT DISTINCT text_hash FROM h WHERE doc_id % 7 <> 3)
      SELECT b.doc_id, b.text_hash,
             (b.doc_id = f.first_id AND base.text_hash IS NULL) AS is_new
      FROM batch b JOIN firsts f USING (text_hash)
      LEFT JOIN base USING (text_hash)
      ORDER BY b.doc_id""",

    // arrival order == id order in the entry's replay, so streaming
    // first-occurrence verdicts equal the corpus-wide window pass
    "q_dedup_stream" -> """
      WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS text_hash
                 FROM documents WHERE doc_id < 300)
      SELECT doc_id, text_hash,
             (doc_id = min(doc_id) OVER (PARTITION BY text_hash)) AS is_new
      FROM h ORDER BY doc_id""",

    "q_dedup_jaccard" -> JaccardPairs,

    // the capped entry drops hot shingles from pair GENERATION only; on the
    // driver corpora every qualifying pair still surfaces through its cold
    // shingles, so the id set equals the exact pairs (inter/uni omitted:
    // capped intersections are lower bounds, not the exact values)
    "q_dedup_jaccard_capped" ->
      s"SELECT id_a, id_b FROM ($JaccardPairs) ORDER BY id_a, id_b",

    "q_dedup_spans" -> s"""
      WITH $spanCtes
      SELECT sp.doc_id, span_start::BIGINT AS span_start,
             span_len::BIGINT AS span_len,
             ${rollHash("array_to_string(list_slice(w, span_start, " +
               "span_start + span_len - 1), ' ')")} AS span_hash
      FROM sp JOIN ws ON ws.doc_id = sp.doc_id
      ORDER BY sp.doc_id, span_start""",

    // incremental mode's contract IS this query: full-corpus span dedup
    // restricted to the arriving batch (doc_id % 7 = 3) — the engine
    // computes it from the batch + the base's persisted gram counts
    // without touching base text
    "q_dedup_spans_inc" -> s"""
      WITH $spanCtes
      SELECT sp.doc_id, span_start::BIGINT AS span_start,
             span_len::BIGINT AS span_len,
             ${rollHash("array_to_string(list_slice(w, span_start, " +
               "span_start + span_len - 1), ' ')")} AS span_hash
      FROM sp JOIN ws ON ws.doc_id = sp.doc_id
      WHERE sp.doc_id % 7 = 3
      ORDER BY sp.doc_id, span_start""",

    "q_dedup_span_clean" -> s"""
      WITH $spanCtes,
      covered AS (SELECT doc_id,
                         unnest(generate_series(span_start,
                           span_start + span_len - 1)) AS pos
                  FROM sp),
      kept AS (SELECT doc_id, pos, tok FROM ex
               ANTI JOIN covered USING (doc_id, pos)),
      agg AS (SELECT doc_id, count(*) AS n_kept,
                     string_agg(tok, ' ' ORDER BY pos) AS clean_text
              FROM kept GROUP BY doc_id)
      SELECT d.doc_id, coalesce(agg.n_kept, 0)::BIGINT AS n_kept,
             ${rollHash("coalesce(agg.clean_text, '')")} AS clean_hash
      FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
      ORDER BY d.doc_id""",

    // LSH candidates are exact-jaccard-verified (precision 1 by
    // construction), so the oracle is the exact-pairs query. Recall is
    // probabilistic: with 16 bands of r=4, a pair at the 0.80 threshold
    // collides with p = 1-(1-0.8^4)^16 ≈ 0.99996, and the driver corpora
    // hold ~25 qualifying pairs (most far above threshold), so the
    // expected miss count is ~1e-3 — negligible at these sizes, and the
    // documented bound to re-derive if the corpus grows.
    "q_dedup_minhash" -> JaccardPairs,

    // incremental = the full exact-pair set restricted to pairs touching
    // the batch (doc_id % 7 = 3); same precision-1 / recall-bound
    // reasoning as q_dedup_minhash above
    "q_dedup_minhash_inc" -> s"""
      SELECT * FROM ($JaccardPairs)
      WHERE id_a % 7 = 3 OR id_b % 7 = 3
      ORDER BY id_a, id_b""",

    // incremental exact jaccard == the full pair list restricted to pairs
    // touching the batch slice (doc_id % 9 = 4)
    "q_dedup_jaccard_inc" -> s"""
      SELECT * FROM ($JaccardPairs)
      WHERE id_a % 9 = 4 OR id_b % 9 = 4
      ORDER BY id_a, id_b""",

    "q_dedup_simhash" -> simhashSql,

    "q_dedup_simhash_inc" -> simhashIncSql,

    // components = min reachable id over the symmetric closure of the
    // exact-pair edge list (recursive CTE); matches the engine's min-label
    // propagation fixpoint exactly
    "q_dedup_components" -> s"""
      WITH RECURSIVE p AS ($JaccardPairs),
      e AS (SELECT id_a AS a, id_b AS b FROM p
            UNION SELECT id_b, id_a FROM p),
      reach AS (
        SELECT a AS id, a AS r FROM e
        UNION
        SELECT e.a AS id, reach.r AS r FROM e JOIN reach ON reach.id = e.b
      )
      SELECT id AS doc_id, min(r) AS rep_id FROM reach
      GROUP BY 1 ORDER BY 1""",

    // survivor verdicts: same recursive components, ranked inside each
    // cluster by the quality keep flag, token count, then id — mirrors
    // Dedup.survivors' window exactly (booleans sort false < true in both
    // engines, DESC puts keepers first)
    "q_dedup_survivors" -> s"""
      WITH RECURSIVE p AS ($JaccardPairs),
      e AS (SELECT id_a AS a, id_b AS b FROM p
            UNION SELECT id_b, id_a FROM p),
      reach AS (
        SELECT a AS id, a AS r FROM e
        UNION
        SELECT e.a AS id, reach.r AS r FROM e JOIN reach ON reach.id = e.b
      ),
      comp AS (SELECT id AS doc_id, min(r) AS rep_id FROM reach GROUP BY 1),
      q AS (SELECT doc_id, len($WsToks)::BIGINT AS n_tokens,
                   length(coalesce(text, ''))::BIGINT AS n_chars,
                   len(list_filter($WsToks,
                     x -> list_contains($Stop, x)))::BIGINT AS n_stop
            FROM documents),
      q2 AS (SELECT doc_id, n_tokens,
                    (n_tokens >= 5 AND n_chars >= 20 AND
                     (CASE WHEN n_tokens > 0
                           THEN n_stop::DOUBLE / n_tokens::DOUBLE
                           ELSE 0.0 END) < 0.5) AS keep
             FROM q),
      m AS (SELECT comp.doc_id, rep_id, q2.n_tokens, q2.keep
            FROM comp JOIN q2 USING (doc_id)),
      r AS (SELECT doc_id, rep_id,
                   row_number() OVER (PARTITION BY rep_id
                     ORDER BY keep DESC, n_tokens DESC, doc_id) AS rk
            FROM m)
      SELECT doc_id, rep_id, rk = 1 AS is_survivor
      FROM r ORDER BY doc_id""",

    // the integer-hash bucket arithmetic stays in int64: (id mod 2^31-1) *
    // 2654435761 <= 5.7e18 < 2^63
    "q_sample_stratified" -> s"""
      WITH l AS ($langIdSql)
      SELECT doc_id, lang_pred FROM l
      WHERE ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 <
            (CASE WHEN lang_pred = 'en' THEN 10 ELSE 60 END)
      ORDER BY doc_id""",

    // single-quoted SQL strings are not escape-processed, so interpolating
    // the Scala pattern constants hands DuckDB's RE2 the same bytes Java
    // compiles; the patterns avoid non-RE2 syntax (CorpusFilters doc)
    "q_text_pii" -> s"""
      WITH inj AS (SELECT doc_id, text ||
        (CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || doc_id::VARCHAR || '@example.com'
              ELSE '' END) ||
        (CASE WHEN doc_id % 4 = 0
              THEN ' from 10.1.' || (doc_id % 256)::VARCHAR || '.9'
              ELSE '' END) ||
        (CASE WHEN doc_id % 5 = 0 THEN ' tel 555-123-4567' ELSE '' END)
          AS text FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(text, '${CorpusFilters.EmailRe}'))::BIGINT
               AS n_email,
             len(regexp_extract_all(text, '${CorpusFilters.Ipv4Re}'))::BIGINT
               AS n_ip,
             len(regexp_extract_all(text, '${CorpusFilters.PhoneRe}'))::BIGINT
               AS n_phone,
             regexp_replace(regexp_replace(regexp_replace(text,
               '${CorpusFilters.EmailRe}', '<EMAIL>', 'g'),
               '${CorpusFilters.Ipv4Re}', '<IP>', 'g'),
               '${CorpusFilters.PhoneRe}', '<PHONE>', 'g') AS clean_text
      FROM inj ORDER BY doc_id""",

    "q_text_repetition" -> s"""
      WITH toks AS (SELECT doc_id, $WsToks AS t FROM documents),
      base AS (SELECT doc_id, len(t)::BIGINT AS n_tokens,
                      len(list_distinct(t))::BIGINT AS n_uniq, t FROM toks),
      w AS (SELECT doc_id, unnest(t) AS g FROM toks),
      wc AS (SELECT doc_id, max(c)::BIGINT AS top_word FROM
               (SELECT doc_id, g, count(*) AS c FROM w GROUP BY 1, 2)
             GROUP BY 1),
      bg AS (SELECT doc_id,
                    unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS g
             FROM toks WHERE len(t) >= 2),
      bc AS (SELECT doc_id, max(c)::BIGINT AS top_bigram FROM
               (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
             GROUP BY 1),
      r AS (SELECT b.doc_id, n_tokens, n_uniq,
              CASE WHEN n_tokens > 0
                   THEN n_uniq::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END
                AS uniq_frac,
              CASE WHEN n_tokens > 0
                   THEN coalesce(wc.top_word, 0)::DOUBLE / n_tokens::DOUBLE
                   ELSE 0.0 END AS top_word_frac,
              CASE WHEN n_tokens > 1
                   THEN coalesce(bc.top_bigram, 0)::DOUBLE /
                        (n_tokens - 1)::DOUBLE
                   ELSE 0.0 END AS top_bigram_frac
            FROM base b LEFT JOIN wc USING (doc_id)
                        LEFT JOIN bc USING (doc_id))
      SELECT doc_id, n_tokens, n_uniq, uniq_frac, top_word_frac,
             top_bigram_frac,
             (uniq_frac >= 0.35 AND top_word_frac <= 0.15 AND
              top_bigram_frac <= 0.08) AS keep
      FROM r ORDER BY doc_id""",

    // start filter (1-based s): keep s=1 or s-1 < n-overlap — drops tail
    // windows fully contained in their predecessor (TextStats.chunk doc)
    "q_text_chunks" -> s"""
      WITH toks AS (SELECT doc_id, $WsToks AS t FROM documents),
      ch AS (SELECT doc_id,
                    list_transform(
                      list_filter(generate_series(1, len(t), 30),
                        s -> s = 1 OR s < len(t) - 10 + 1),
                      s -> array_to_string(t[s:s+39], ' ')) AS cs
             FROM toks WHERE len(t) > 0),
      c AS (SELECT doc_id, unnest(cs) AS chunk_text,
                   generate_subscripts(cs, 1) - 1 AS chunk_idx
            FROM ch)
      SELECT doc_id, chunk_idx::BIGINT AS chunk_idx, chunk_text,
             len(string_split(chunk_text, ' '))::BIGINT AS n_chunk_tokens
      FROM c ORDER BY doc_id, chunk_idx""",

    // packing: sum() OVER returns HUGEINT in DuckDB; cast every derived
    // column back to BIGINT so the value hashes match Spark's longs
    "q_text_pack" -> s"""
      WITH n AS (SELECT doc_id, source, len($WsToks)::BIGINT AS n_tokens
                 FROM documents),
      c AS (SELECT *, coalesce(sum(n_tokens) OVER
                (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS prev_cum
            FROM n)
      SELECT doc_id, source, n_tokens,
             (prev_cum // 2048)::BIGINT AS bin_id,
             (prev_cum % 2048)::BIGINT AS bin_offset
      FROM c ORDER BY doc_id""",

    "q_text_urls" -> s"""
      WITH inj AS (SELECT doc_id, text ||
        (CASE WHEN doc_id % 3 = 0
              THEN ' see https://ok.example.org/p/' || doc_id::VARCHAR
              ELSE '' END) ||
        (CASE WHEN doc_id % 5 = 0
              THEN ' via http://spam.bad-site.com/x' ELSE '' END)
          AS text FROM documents),
      u AS (SELECT doc_id,
                   regexp_extract_all(text, '${CorpusFilters.UrlRe}')
                     AS urls
            FROM inj),
      b AS (SELECT doc_id, len(urls)::BIGINT AS n_urls,
                   len(list_filter(
                     list_transform(urls,
                       x -> regexp_replace(lower(
                         regexp_extract(x, '${CorpusFilters.DomainRe}', 1)),
                         '\\.+$$', '')),
                     d -> d = 'spam.bad-site.com' OR
                          suffix(d, '.spam.bad-site.com')))::BIGINT
                     AS n_blocked
            FROM u)
      SELECT doc_id, n_urls, n_blocked, (n_blocked = 0) AS keep
      FROM b ORDER BY doc_id""",

    // add-1 bigram LM (CorpusFilters.lmScore): the ref slice's counts and
    // vocabulary feed P(w2|w1) = (c2+1)/(c1+V); per-gram ln is quantized
    // to round(x*1e6)::BIGINT so the per-doc sum is order-independent
    // integer arithmetic (raw double sums are association-sensitive)
    // mirrors classifierScore's arithmetic term for term (same left-assoc
    // order, same quantization) with the entry's fixed weights
    "q_text_classifier" -> s"""
      WITH b AS (SELECT doc_id, length(coalesce(text, ''))::BIGINT AS n_chars,
                        $WsToks AS toks,
                        len(regexp_extract_all(coalesce(text, ''),
                          '[^A-Za-z0-9\\s]'))::BIGINT
                          AS n_punct
                 FROM documents),
      c AS (SELECT doc_id, n_chars, len(toks)::BIGINT AS n_tokens,
                   len(list_filter(toks, x -> list_contains($Stop, x)))::BIGINT
                     AS n_stop,
                   n_punct
            FROM b),
      r AS (SELECT *,
                   CASE WHEN n_tokens > 0
                        THEN n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END
                     AS stop_ratio,
                   CASE WHEN n_tokens > 0
                        THEN (n_chars - (n_tokens - 1))::DOUBLE / n_tokens::DOUBLE
                        ELSE 0.0 END AS mean_word_len
            FROM c),
      z AS (SELECT doc_id,
                   (-2.0 * 1.0
                    + 0.25 * ln(n_chars::DOUBLE + 1.0)
                    + 0.45 * ln(n_tokens::DOUBLE + 1.0)
                    + -3.0 * stop_ratio
                    + -4.0 * (n_punct::DOUBLE / greatest(n_chars, 1)::DOUBLE)
                    + 0.05 * mean_word_len) AS z
            FROM r),
      q AS (SELECT doc_id,
                   round(1000000.0 / (exp(-z) + 1.0))::BIGINT AS score_q
            FROM z)
      SELECT doc_id, score_q, (score_q >= 500000) AS keep
      FROM q ORDER BY doc_id""",

    "q_text_perplexity" -> s"""
      WITH ws AS (SELECT doc_id, $WsToks AS w FROM documents),
      rex AS (SELECT doc_id, unnest(w) AS tok,
                     generate_subscripts(w, 1) AS pos
              FROM ws WHERE doc_id % 10 = 0),
      rbg AS (SELECT tok AS w1, lead(tok) OVER
                       (PARTITION BY doc_id ORDER BY pos) AS w2
              FROM rex),
      rb AS (SELECT w1, w2 FROM rbg WHERE w2 IS NOT NULL),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM rb GROUP BY 1, 2),
      c1 AS (SELECT w1, count(*) AS c1 FROM rb GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS v FROM rex),
      cex AS (SELECT doc_id, unnest(w) AS tok,
                     generate_subscripts(w, 1) AS pos
              FROM ws),
      cbg AS (SELECT doc_id, tok AS w1, lead(tok) OVER
                       (PARTITION BY doc_id ORDER BY pos) AS w2
              FROM cex),
      cb AS (SELECT doc_id, w1, w2 FROM cbg WHERE w2 IS NOT NULL),
      sc AS (SELECT cb.doc_id,
                    round(ln((coalesce(c2.c2, 0) + 1)::DOUBLE /
                             (coalesce(c1.c1, 0) + v.v)::DOUBLE)
                          * 1000000.0)::BIGINT AS qlp
             FROM cb LEFT JOIN c2 ON c2.w1 = cb.w1 AND c2.w2 = cb.w2
                     LEFT JOIN c1 ON c1.w1 = cb.w1
                     CROSS JOIN v),
      agg AS (SELECT doc_id, count(*) AS n_grams, sum(qlp) AS logprob_q
              FROM sc GROUP BY 1)
      SELECT d.doc_id, coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
             coalesce(agg.logprob_q, 0)::BIGINT AS logprob_q
      FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
      ORDER BY d.doc_id""",

    "q_decontaminate" -> s"""
      WITH $Shingles,
      bench AS (SELECT DISTINCT shingle FROM s WHERE doc_id % 97 = 0)
      SELECT s.doc_id, count(*)::BIGINT AS n_hit_grams
      FROM s JOIN bench USING (shingle)
      WHERE s.doc_id % 97 <> 0
      GROUP BY 1 ORDER BY 1""",

    "q_sim_ann_brute" -> annBruteSql,

    "q_sim_neardup" -> s"""
      WITH e AS (SELECT vec_id, embedding, $EmbNorm AS n2 FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ${embDot("a.embedding", "b.embedding")} /
                     (sqrt(a.n2) * sqrt(b.n2)) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, cos FROM p WHERE cos >= 0.42 ORDER BY id_a, id_b""",

    // the REAL-PNG round trip (Multimodal.attachPng + ImageIoCodec): the
    // oracle computes the generator's closed form only — the ENGINE is
    // what proves ImageIO encode -> binary -> decode returns it intact
    "q_mm_decode" -> """
      SELECT doc_id,
             (8 + doc_id % 16)::BIGINT AS width,
             (8 + (doc_id // 16) % 16)::BIGINT AS height,
             ((doc_id * 7) % 256)::BIGINT AS mean_r,
             ((doc_id * 13) % 256)::BIGINT AS mean_g,
             ((doc_id * 31) % 256)::BIGINT AS mean_b
      FROM documents ORDER BY doc_id""",

    "q_mm_features" -> """
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             (16 + (length(text) % 64))::BIGINT AS width,
             (16 + ((length(text) // 64) % 64))::BIGINT AS height,
             length(text)::BIGINT AS n_bytes
      FROM documents ORDER BY doc_id""",

    // length(text) > 0: the Spark side emits no row for an empty payload
    // (no frames -> no groupBy group), so the oracle must skip empty video
    // docs too. n_bytes/lengths assume 1 byte per char (the testdata text
    // is ASCII; the fake codec measures the UTF-8 payload).
    "q_mm_frames" -> """
      SELECT doc_id, (((length(text) + 255) // 256) + 1) // 2 AS n_frames
      FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0
      ORDER BY doc_id""",

    "q_fts_tokenize" -> s"""
      WITH $FtsTok
      SELECT doc_id, term, count(*) AS tf FROM tok
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_fts_tokenize_sql" -> s"""
      WITH $FtsTok
      SELECT doc_id, term, count(*) AS tf FROM tok
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_fts_doc_stats" -> s"""
      WITH $FtsTok,
      st AS (SELECT doc_id, count(DISTINCT term) AS word_count,
                    count(*) AS dl
             FROM tok GROUP BY 1)
      SELECT d.doc_id, coalesce(st.word_count, 0)::BIGINT AS word_count,
             coalesce(st.dl, 0)::BIGINT AS dl
      FROM documents d LEFT JOIN st USING (doc_id) ORDER BY doc_id""",

    "q_fts_dict" -> s"""
      WITH $FtsTok
      SELECT term, count(DISTINCT doc_id) AS df FROM tok
      GROUP BY 1 ORDER BY 1""",

    "q_fts_merge_dict" -> s"""
      WITH $FtsTok
      SELECT term, count(DISTINCT doc_id) AS df FROM tok
      GROUP BY 1 ORDER BY 1""",

    "q_fts_search_count" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
      ORDER BY doc_id""",

    // deletion, count path: tombstoned docs (doc_id % 10 == 3) drop from
    // the hit set; every surviving doc's cnt is exactly its pre-delete
    // value (per-doc counts never depend on other docs)
    "q_fts_del_count" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
        AND a.doc_id % 10 != 3
      ORDER BY doc_id""",

    "q_fts_search_wild" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      m1 AS (SELECT doc_id, count(DISTINCT term) AS c FROM has
             WHERE term LIKE 'strea%' GROUP BY 1),
      m2 AS (SELECT doc_id, count(DISTINCT term) AS c FROM has
             WHERE term LIKE 'windo%' GROUP BY 1)
      SELECT coalesce(m1.doc_id, m2.doc_id) AS doc_id,
             (coalesce(m1.c, 0) + coalesce(m2.c, 0))::BIGINT AS cnt
      FROM m1 FULL OUTER JOIN m2 ON m1.doc_id = m2.doc_id
      ORDER BY doc_id""",

    "q_fts_bm25" -> bm25Sql(),

    // synonym expansion: "customer" matches {customer, stream, vector}
    // as one group — v = distinct matched group words per doc; AND'd
    // "filter" adds its own 1
    "q_fts_syn_count" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      grp AS (SELECT doc_id, count(*)::BIGINT AS v FROM has
              WHERE term IN ('customer', 'stream', 'vector') GROUP BY 1)
      SELECT g.doc_id, (g.v + 1)::BIGINT AS cnt
      FROM grp g
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      ORDER BY doc_id""",

    // synonym BM25: per doc the customer and stream contributions sum
    // (at most two operands — commutative, bit-exact)
    "q_fts_syn_bm25" -> s"""
      WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN ('customer', 'stream') GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE term IN ('customer', 'stream') GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      sc AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc ORDER BY score DESC, doc_id LIMIT 20""",

    // term boosting: ("customer"^2 OR "stream") — the customer
    // contribution is ONE dictionary term scaled by one IEEE multiply;
    // OR adds at most two operands (commutative), so ranks are bit-exact
    "q_fts_boost_bm25" -> s"""
      WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN ('customer', 'stream') GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE term IN ('customer', 'stream') GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      u AS (SELECT doc_id, c * 2.0::DOUBLE AS c FROM contrib
            WHERE term = 'customer'
            UNION ALL
            SELECT doc_id, c FROM contrib WHERE term = 'stream'),
      sc AS (SELECT doc_id, sum(c) AS score FROM u GROUP BY doc_id)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc ORDER BY score DESC, doc_id LIMIT 20""",

    // boosted AND counts exactly like the unboosted query: every hit
    // carries cnt = 2 (two matched exact terms)
    "q_fts_boost_count" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      ORDER BY doc_id""",

    // deletion, masked-hit phase: live docs keep their FULL-corpus BM25
    // scores (stats stale until compaction — the Lucene contract), only
    // the ranked set shrinks
    "q_fts_del_bm25" -> bm25Sql(hitsPred = "doc_id % 10 != 3"),

    // deletion after compaction: the purged docs influence nothing — the
    // oracle recomputes every statistic over the live corpus only
    "q_fts_del_compact_bm25" -> bm25Sql(corpusPred = "doc_id % 10 != 3"),

    // fuzzy term search: the oracle states the SEMANTICS (any dictionary
    // word within edit distance 1) directly via levenshtein — the engine's
    // generated-neighborhood probe must be extensionally identical
    "q_fts_fuzzy" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT doc_id, count(DISTINCT term)::BIGINT AS cnt FROM has
      WHERE levenshtein(term, 'custmer') <= 1
      GROUP BY 1 ORDER BY doc_id""",

    "q_fts_fuzzy2" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT doc_id, count(DISTINCT term)::BIGINT AS cnt FROM has
      WHERE levenshtein(term, 'custme') <= 2
      GROUP BY 1 ORDER BY doc_id""",

    "q_fts_fuzzy_bm25" -> fuzzyBm25Sql,

    // ~custmer AND "stream": the fuzzy virtual term counts its distinct
    // 1-edit dictionary matches per doc; AND adds the word's 1
    "q_fts_fuzzy_bool" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      f AS (SELECT doc_id, count(DISTINCT term) AS c FROM has
            WHERE levenshtein(term, 'custmer') <= 1 GROUP BY 1),
      e AS (SELECT doc_id FROM has WHERE term = 'stream')
      SELECT f.doc_id, (f.c + 1)::BIGINT AS cnt
      FROM f JOIN e USING (doc_id) ORDER BY f.doc_id""",

    "q_fts_fuzzy_bm25_bool" -> fuzzyBoolBm25Sql,

    // conversation rollup over the 8-turns-per-conv reshaped corpus:
    // per-doc wildcard counts (the q_fts_search_wild shape) grouped by
    // doc_id // 8, top-40 by (total desc, conv asc)
    "q_fts_conv_rollup" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      m1 AS (SELECT doc_id, count(DISTINCT term) AS c FROM has
             WHERE term LIKE 'custom%' GROUP BY 1),
      m2 AS (SELECT doc_id, count(DISTINCT term) AS c FROM has
             WHERE term LIKE 'windo%' GROUP BY 1),
      hit AS (SELECT coalesce(m1.doc_id, m2.doc_id) AS doc_id,
                     coalesce(m1.c, 0) + coalesce(m2.c, 0) AS cnt
              FROM m1 FULL OUTER JOIN m2 ON m1.doc_id = m2.doc_id),
      r AS (SELECT doc_id // 8 AS conv, sum(cnt) AS total_cnt,
                   count(*) AS n_turns FROM hit GROUP BY 1),
      top AS (SELECT conv, total_cnt, n_turns FROM r
              ORDER BY total_cnt DESC, conv LIMIT 40)
      SELECT conv::BIGINT AS conv, total_cnt::BIGINT AS total_cnt,
             n_turns::BIGINT AS n_turns
      FROM top ORDER BY conv""",

    "q_fts_mlt" -> mltSql,

    "q_fts_suggest" -> s"""
      WITH $FtsTok,
      d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
            GROUP BY 1)
      SELECT term, df FROM d WHERE term LIKE 's%'
      ORDER BY df DESC, term LIMIT 5""",

    // "did you mean": the oracle states the semantics directly —
    // dictionary words at levenshtein distance EXACTLY 1 (the generated
    // neighborhood probe must be extensionally identical; distance 0 =
    // the input itself is excluded), df-ranked
    "q_fts_spell" -> s"""
      WITH $FtsTok,
      d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
            GROUP BY 1)
      SELECT term, df FROM d WHERE levenshtein(term, 'custmer') = 1
      ORDER BY df DESC, term LIMIT 5""",

    "q_fts_regex" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT doc_id, count(DISTINCT term)::BIGINT AS cnt FROM has
      WHERE regexp_matches(term, 'er$$')
      GROUP BY 1 ORDER BY doc_id""",

    // snippets: the q_fts_search_wild count shape (exact 'customer' +
    // windo-prefix), top 15, then the ±3-kept-token window around the
    // first matching position (1-based here, 0-based engine-side — the
    // slice bounds translate exactly)
    "q_fts_snippet" -> s"""
      WITH $FtsPosTok,
      has AS (SELECT DISTINCT doc_id, term FROM tokp),
      m1 AS (SELECT doc_id, 1 AS c FROM has WHERE term = 'customer'),
      m2 AS (SELECT doc_id, count(DISTINCT term) AS c FROM has
             WHERE term LIKE 'windo%' GROUP BY 1),
      hit AS (SELECT coalesce(m1.doc_id, m2.doc_id) AS doc_id,
                     coalesce(m1.c, 0) + coalesce(m2.c, 0) AS cnt
              FROM m1 FULL OUTER JOIN m2 ON m1.doc_id = m2.doc_id),
      top AS (SELECT doc_id, cnt FROM hit ORDER BY cnt DESC, doc_id LIMIT 15),
      arrs AS (SELECT doc_id, list(term ORDER BY p) AS w FROM rk GROUP BY 1),
      fp AS (SELECT rk.doc_id, min(rk.p) AS p
             FROM rk JOIN top USING (doc_id)
             WHERE rk.term = 'customer' OR rk.term LIKE 'windo%'
             GROUP BY 1)
      SELECT top.doc_id, top.cnt::BIGINT AS cnt,
             array_to_string(a.w[greatest(1, fp.p - 3):fp.p + 3], ' ')
               AS snippet
      FROM top JOIN fp USING (doc_id) JOIN arrs a USING (doc_id)
      ORDER BY top.doc_id""",

    "q_fts_phrase" -> s"""
      WITH $FtsPosTok,
      $PhraseHits
      SELECT doc_id, cnt::BIGINT AS cnt FROM hits ORDER BY doc_id""",

    "q_fts_phrase_bm25" -> phraseBm25Sql,

    // ('value table' AND "customer" NOT 'spark batch'): phrase-in-boolean
    // — AND adds counts (phrase occurrences + 1 matched word), NOT erases
    "q_fts_phrase_bool" -> s"""
      WITH $FtsPosTok,
      gr AS (SELECT doc_id, term || ' ' || lead(term, 1) OVER win AS gram
             FROM rk WINDOW win AS (PARTITION BY doc_id ORDER BY p)),
      h1 AS (SELECT doc_id, count(*) AS cnt FROM gr
             WHERE gram = 'value table' GROUP BY 1),
      h2 AS (SELECT DISTINCT doc_id FROM gr WHERE gram = 'spark batch'),
      hc AS (SELECT DISTINCT doc_id FROM tokp WHERE term = 'customer')
      SELECT h1.doc_id AS doc_id, (h1.cnt + 1)::BIGINT AS cnt
      FROM h1 JOIN hc ON h1.doc_id = hc.doc_id
      WHERE h1.doc_id NOT IN (SELECT doc_id FROM h2)
      ORDER BY h1.doc_id""",

    // BM25 of ('value table' AND "customer"): phrase virtual-term score +
    // word term score (two-operand IEEE addition is commutative, so the
    // oracle's sum matches the engine's bit-for-bit); rank-only output
    "q_fts_phrase_bm25_bool" -> s"""
      WITH $FtsPosTok,
      $PhraseHits,
      st AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      dfp AS (SELECT count(*)::DOUBLE AS df FROM hits),
      tfc AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM tokp
              WHERE term = 'customer' GROUP BY 1),
      dfw AS (SELECT count(*)::DOUBLE AS df FROM tfc),
      sc AS (SELECT h.doc_id,
          ln(1.0 + (m.nd - dfp.df + 0.5) / (dfp.df + 0.5)) *
            ((h.cnt::DOUBLE * (1.2 + 1.0)) /
             (h.cnt::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl))))
          + ln(1.0 + (m.nd - dfw.df + 0.5) / (dfw.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS score
        FROM hits h JOIN tfc t ON h.doc_id = t.doc_id
        JOIN alld a ON a.doc_id = h.doc_id
        CROSS JOIN m CROSS JOIN dfp CROSS JOIN dfw)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc ORDER BY score DESC, doc_id LIMIT 20""",

    // NEAR(customer, vector, 3): position pairs within distance 3 over the
    // kept-token stream (distinct words, so the pair join is the count)
    "q_fts_near" -> s"""
      WITH $FtsPosTok,
      pa AS (SELECT doc_id, p FROM rk WHERE term = 'customer'),
      pb AS (SELECT doc_id, p FROM rk WHERE term = 'vector')
      SELECT pa.doc_id AS doc_id, count(*)::BIGINT AS cnt
      FROM pa JOIN pb ON pa.doc_id = pb.doc_id AND abs(pa.p - pb.p) <= 3
      GROUP BY 1 ORDER BY pa.doc_id""",

    // ONEAR(customer before vector, 3): ordered pairs, 1 <= j-i <= 3
    "q_fts_onear" -> s"""
      WITH $FtsPosTok,
      pa AS (SELECT doc_id, p FROM rk WHERE term = 'customer'),
      pb AS (SELECT doc_id, p FROM rk WHERE term = 'vector')
      SELECT pa.doc_id AS doc_id, count(*)::BIGINT AS cnt
      FROM pa JOIN pb ON pa.doc_id = pb.doc_id
        AND pb.p - pa.p BETWEEN 1 AND 3
      GROUP BY 1 ORDER BY pa.doc_id""",

    // related terms: PMI = ln(co_df·N / (df_seed·df_term)) over the seed's
    // doc set, co_df >= 2, seed excluded; top-10 by (pmi desc, term asc)
    // then re-sorted by term (the entry's row-order convention)
    "q_fts_related" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
      seed AS (SELECT doc_id FROM has WHERE term = 'customer'),
      dfs AS (SELECT count(*)::DOUBLE AS df FROM seed),
      df AS (SELECT term, count(*)::DOUBLE AS df FROM has GROUP BY 1),
      co AS (SELECT h.term, count(*)::BIGINT AS co_df
             FROM has h JOIN seed s USING (doc_id)
             WHERE h.term <> 'customer' GROUP BY 1),
      top AS (SELECT co.term, co.co_df,
                ln((co.co_df::DOUBLE * n.nd) / (dfs.df * df.df)) AS pmi
              FROM co JOIN df USING (term) CROSS JOIN n CROSS JOIN dfs
              WHERE co.co_df >= 2
              ORDER BY pmi DESC, co.term LIMIT 10)
      SELECT term, co_df, pmi FROM top ORDER BY term""",

    // metadata-filtered count: the q_fts_search_count result restricted to
    // docs passing the lang/source predicate (counts stay corpus-global)
    "q_fts_where" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      keys AS (SELECT doc_id FROM documents
               WHERE lang = 'en' AND source <> 'src13')
      SELECT a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      JOIN keys USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
      ORDER BY a.doc_id""",

    // facet counts over the hits of "customer" AND "filter": every hit
    // carries cnt = 2 (two matched exact terms), grouped by source;
    // top-5 by (n_docs desc, facet asc) — the tie order makes the LIMIT
    // deterministic in both engines
    "q_fts_facets" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok),
      hits AS (SELECT a.doc_id, 2::BIGINT AS cnt
        FROM (SELECT doc_id FROM has WHERE term = 'customer') a
        JOIN (SELECT doc_id FROM has WHERE term = 'filter') f
          USING (doc_id))
      SELECT d.source AS facet, count(*)::BIGINT AS n_docs,
             sum(h.cnt)::BIGINT AS total_cnt
      FROM hits h JOIN documents d USING (doc_id)
      GROUP BY 1
      ORDER BY n_docs DESC, facet ASC
      LIMIT 5""",

    // BM25 of ("customer" OR "stream") restricted to the same predicate:
    // OR adds the two term scores (IEEE two-operand sums are commutative;
    // a doc matching one term scores that term alone — x + 0 only where
    // both match is never taken, coalesce models the engine's outer OR)
    "q_fts_where_bm25" -> s"""
      WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tfa AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM tok
              WHERE term = 'customer' GROUP BY 1),
      tfb AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM tok
              WHERE term = 'stream' GROUP BY 1),
      dfa AS (SELECT count(*)::DOUBLE AS df FROM tfa),
      dfb AS (SELECT count(*)::DOUBLE AS df FROM tfb),
      sa AS (SELECT t.doc_id,
          ln(1.0 + (m.nd - dfa.df + 0.5) / (dfa.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS s
          FROM tfa t JOIN alld a USING (doc_id) CROSS JOIN m CROSS JOIN dfa),
      sb AS (SELECT t.doc_id,
          ln(1.0 + (m.nd - dfb.df + 0.5) / (dfb.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS s
          FROM tfb t JOIN alld a USING (doc_id) CROSS JOIN m CROSS JOIN dfb),
      sc AS (SELECT coalesce(sa.doc_id, sb.doc_id) AS doc_id,
                    coalesce(sa.s, 0.0) + coalesce(sb.s, 0.0) AS score
             FROM sa FULL OUTER JOIN sb ON sa.doc_id = sb.doc_id),
      keys AS (SELECT doc_id FROM documents
               WHERE lang = 'en' AND source <> 'src13')
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc JOIN keys USING (doc_id)
      ORDER BY score DESC, doc_id LIMIT 20""",

    // NEAR-all(customer; vector, stream; 4): anchor semantics — count of
    // 'customer' positions with BOTH other words within distance 4
    "q_fts_nearall" -> s"""
      WITH $FtsPosTok,
      pa AS (SELECT doc_id, p FROM rk WHERE term = 'customer'),
      pb AS (SELECT doc_id, p FROM rk WHERE term = 'vector'),
      pc AS (SELECT doc_id, p FROM rk WHERE term = 'stream')
      SELECT pa.doc_id AS doc_id, count(*)::BIGINT AS cnt
      FROM pa
      WHERE EXISTS (SELECT 1 FROM pb WHERE pb.doc_id = pa.doc_id
              AND abs(pb.p - pa.p) <= 4)
        AND EXISTS (SELECT 1 FROM pc WHERE pc.doc_id = pa.doc_id
              AND abs(pc.p - pa.p) <= 4)
      GROUP BY 1 ORDER BY pa.doc_id""",

    // 'customer vector'~3 AND "stream": the slop virtual term counts its
    // near position pairs within 3 (the q_fts_near shape); AND adds the
    // word's matched 1
    "q_fts_slop_bool" -> s"""
      WITH $FtsPosTok,
      pa AS (SELECT doc_id, p FROM rk WHERE term = 'customer'),
      pb AS (SELECT doc_id, p FROM rk WHERE term = 'vector'),
      nh AS (SELECT pa.doc_id AS doc_id, count(*) AS cnt
             FROM pa JOIN pb ON pa.doc_id = pb.doc_id
               AND abs(pa.p - pb.p) <= 3
             GROUP BY 1),
      e AS (SELECT DISTINCT doc_id FROM tokp WHERE term = 'stream')
      SELECT nh.doc_id AS doc_id, (nh.cnt + 1)::BIGINT AS cnt
      FROM nh JOIN e USING (doc_id) ORDER BY nh.doc_id""",

    // BM25 of ('customer vector'~3 AND "stream"): slop virtual-term score
    // (tf = near-pair count, df = near hit count) + word term score; the
    // two-operand IEEE sum is commutative so the oracle matches
    // bit-for-bit; rank-only output
    "q_fts_slop_bm25_bool" -> s"""
      WITH $FtsPosTok,
      pa AS (SELECT doc_id, p FROM rk WHERE term = 'customer'),
      pb AS (SELECT doc_id, p FROM rk WHERE term = 'vector'),
      nh AS (SELECT pa.doc_id AS doc_id, count(*) AS cnt
             FROM pa JOIN pb ON pa.doc_id = pb.doc_id
               AND abs(pa.p - pb.p) <= 3
             GROUP BY 1),
      st AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      dfp AS (SELECT count(*)::DOUBLE AS df FROM nh),
      tfc AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM tokp
              WHERE term = 'stream' GROUP BY 1),
      dfw AS (SELECT count(*)::DOUBLE AS df FROM tfc),
      sc AS (SELECT h.doc_id,
          ln(1.0 + (m.nd - dfp.df + 0.5) / (dfp.df + 0.5)) *
            ((h.cnt::DOUBLE * (1.2 + 1.0)) /
             (h.cnt::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl))))
          + ln(1.0 + (m.nd - dfw.df + 0.5) / (dfw.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS score
        FROM nh h JOIN tfc t ON h.doc_id = t.doc_id
        JOIN alld a ON a.doc_id = h.doc_id
        CROSS JOIN m CROSS JOIN dfp CROSS JOIN dfw)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk, doc_id
      FROM sc ORDER BY score DESC, doc_id LIMIT 20""",

    "q_fts_bm25_bool" -> bm25BoolSql,

    // a healthy snapshot reports zero violations for every check
    "q_fts_index_check" -> graft.verify.IndexCheck.CheckNames.sorted
      .map(n => s"SELECT '$n' AS check_name, 0::BIGINT AS violations")
      .mkString(" UNION ALL "),

    // the layered merge snapshot must be just as healthy...
    "q_fts_merge_check" -> graft.verify.IndexCheck.CheckNames.sorted
      .map(n => s"SELECT '$n' AS check_name, 0::BIGINT AS violations")
      .mkString(" UNION ALL "),

    // ...and answer searches identically to the one-shot build
    "q_fts_merge_search" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
      ORDER BY doc_id""",

    // reverse search: each query_id's rows are exactly the docs whose
    // kept-word set satisfies that registered query
    "q_fts_percolate" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT 0 AS query_id, a.doc_id
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
      UNION ALL
      SELECT 1 AS query_id, doc_id FROM has WHERE term = 'stream'
      UNION ALL
      SELECT 2 AS query_id, doc_id FROM
        (SELECT DISTINCT doc_id FROM has
         WHERE term IN ('window', 'batch'))
      ORDER BY query_id, doc_id""",

    // streaming percolation: batch-boundary-independent — the alerts are
    // exactly the batch percolate over the replayed slice
    "q_fts_percolate_stream" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok WHERE doc_id < 300)
      SELECT 0 AS query_id, a.doc_id
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
      UNION ALL
      SELECT 1 AS query_id, doc_id FROM has WHERE term = 'stream'
      UNION ALL
      SELECT 2 AS query_id, doc_id FROM
        (SELECT DISTINCT doc_id FROM has
         WHERE term IN ('window', 'batch'))
      ORDER BY query_id, doc_id""",

    // index vocabulary statistics: per-letter aggregates over the same
    // tokenization, hottest term tied alphabetically
    "q_fts_dict_stats" -> s"""
      WITH $FtsTok,
      t AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
            GROUP BY 1),
      lt AS (SELECT substr(term, 1, 1) AS letter, term, df FROM t),
      agg AS (SELECT letter, count(*)::BIGINT AS n_terms,
                     sum(df)::BIGINT AS sum_df
              FROM lt GROUP BY 1),
      top AS (SELECT letter, term AS top_term, df AS top_df,
                     row_number() OVER (PARTITION BY letter
                       ORDER BY df DESC, term) AS rn
              FROM lt)
      SELECT a.letter, a.n_terms, a.sum_df, t.top_term, t.top_df
      FROM agg a JOIN top t ON a.letter = t.letter AND t.rn = 1
      ORDER BY a.letter""",

    // score explanation: the top-1 doc's per-term breakdown; idf/tfnorm
    // state the engine's formulas directly
    "q_fts_explain" -> s"""
      WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN ('customer', 'stream', 'window') GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE term IN ('customer', 'stream', 'window') GROUP BY 1),
      parts AS (SELECT t.doc_id, t.term AS word, t.tf, f.df,
          a.dl::DOUBLE AS dl,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) AS idf,
          ((t.tf * (1.2 + 1.0)) /
           (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl))))
            AS tfnorm
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      sc AS (SELECT doc_id,
                    list_reduce(list_prepend(0.0::DOUBLE,
                        list(idf * tfnorm ORDER BY word)),
                      (x, y) -> x + y) AS score
             FROM parts GROUP BY doc_id),
      top1 AS (SELECT doc_id FROM sc ORDER BY score DESC, doc_id LIMIT 1)
      SELECT word, tf, df, round(idf, 10) AS idf,
             round(tfnorm, 10) AS tfnorm,
             round(idf * tfnorm, 10) AS contribution
      FROM parts WHERE doc_id = (SELECT doc_id FROM top1)
      ORDER BY word""",

    // keyset pagination: page 2 == ranks 11..20 of the same ranking
    "q_fts_page2" -> s"""
      SELECT rnk, doc_id FROM (${bm25Sql()}) sub
      WHERE rnk > 10 ORDER BY rnk""",

    // batch execution: each query_id's rows are exactly that query's
    // individual count semantics (AND sums matched-word counts, exact OR
    // counts the present group members, NOT erases)
    "q_fts_batch_count" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT 0 AS query_id, a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
      UNION ALL
      SELECT 1 AS query_id, doc_id, 1::BIGINT AS cnt
      FROM has WHERE term = 'stream'
      UNION ALL
      SELECT 2 AS query_id, doc_id, count(*)::BIGINT AS cnt
      FROM has WHERE term IN ('window', 'batch') GROUP BY doc_id
      ORDER BY query_id, doc_id""",

    // BM25 batch: per-query rankings over shared per-term contributions;
    // AND adds two operands, OR sums at most two (commutative), NOT
    // erases — ranks bit-exact
    "q_fts_batch_bm25" -> s"""
      WITH $FtsTok,
      st AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      alld AS (SELECT d.doc_id, coalesce(st.dl, 0) AS dl
               FROM documents d LEFT JOIN st USING (doc_id)),
      m AS (SELECT count(*)::DOUBLE AS nd,
                   sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM alld),
      tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
             WHERE term IN ('customer','filter','window','batch','stream','vector')
             GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
             WHERE term IN ('customer','filter','window','batch','stream','vector')
             GROUP BY 1),
      contrib AS (SELECT t.doc_id, t.term,
          ln(1.0 + (m.nd - f.df + 0.5) / (f.df + 0.5)) *
            ((t.tf * (1.2 + 1.0)) /
             (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (a.dl::DOUBLE / m.avgdl)))) AS c
          FROM tf t JOIN df f USING (term)
          JOIN alld a ON a.doc_id = t.doc_id CROSS JOIN m),
      q0 AS (SELECT 0 AS query_id, a.doc_id, a.c + b.c AS score
             FROM (SELECT doc_id, c FROM contrib WHERE term = 'customer') a
             JOIN (SELECT doc_id, c FROM contrib WHERE term = 'filter') b
             USING (doc_id)),
      q1 AS (SELECT 1 AS query_id, doc_id, sum(c) AS score FROM contrib
             WHERE term IN ('window', 'batch') GROUP BY doc_id),
      q2 AS (SELECT 2 AS query_id, doc_id, c AS score FROM contrib
             WHERE term = 'stream' AND doc_id NOT IN
               (SELECT doc_id FROM contrib WHERE term = 'vector')),
      allq AS (SELECT * FROM q0 UNION ALL SELECT * FROM q1
               UNION ALL SELECT * FROM q2),
      ranked AS (SELECT query_id, doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id) AS rnk
                 FROM allq)
      SELECT query_id, rnk::BIGINT AS rnk, doc_id FROM ranked
      WHERE rnk <= 20 ORDER BY query_id, rnk""",

    // point-in-time count: the merged index pinned to v1 indexes ONLY the
    // first-half batch (doc_id <= max/2, the indexDirMerged split) — same
    // count semantics, hit set restricted to that half
    "q_fts_asof_count" -> s"""
      WITH $FtsTok,
      has AS (SELECT DISTINCT doc_id, term FROM tok)
      SELECT a.doc_id, 2::BIGINT AS cnt
      FROM (SELECT doc_id FROM has WHERE term = 'customer') a
      JOIN (SELECT doc_id FROM has WHERE term = 'filter') f USING (doc_id)
      WHERE a.doc_id NOT IN (SELECT doc_id FROM has WHERE term = 'vector')
        AND a.doc_id <= (SELECT max(doc_id) // 2 FROM documents)
      ORDER BY doc_id""",

    // point-in-time BM25: every statistic (numDocs, avgdl, df, tf) is the
    // v1 snapshot's — i.e. computed over the first-half corpus only
    "q_fts_asof_bm25" -> bm25Sql(
      corpusPred = "doc_id <= (SELECT max(doc_id) // 2 FROM documents)")
  )
}
