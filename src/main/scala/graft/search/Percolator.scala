package graft.search

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{EngineConf, Turn}

/** Reverse search (the Elasticsearch percolate / Lucene Monitor posture):
  * match DOCUMENTS against a registered set of queries — the alerting /
  * routing primitive of a document pipeline ("which stored filters does
  * this arriving doc trip?").
  *
  * 100-TB shape: registered queries are an application asset (bounded,
  * driver-side), and each one COMPILES into a codegen Column predicate
  * over the doc's kept-word set (`array_contains` for exact terms,
  * `exists`+`startsWith` for wildcard prefixes, boolean algebra for
  * AND/OR/NOT) — so the whole percolation is ONE map-side projection over
  * the corpus: zero shuffles, zero joins, no index required, nothing even
  * broadcast (the queries live in the plan itself). Tokenization is the
  * engine's own `graft_tokenize`, and the query grammar is the reference
  * parser with every quirk (wildcard min-char rejection, malformed-query
  * tolerance: an invalid registered query matches nothing), so percolate
  * membership agrees EXACTLY with [[Searcher.searchCount]]'s hit set over
  * an index of the same corpus.
  */
object Percolator {

  /** Per-term membership condition over the doc's distinct kept-word set —
    * the semantic mirror of Searcher.matchCond (whose letter clause is
    * pure partition pruning). */
  private def termCond(words: Column, term: String, isExact: Boolean,
      conf: EngineConf): Column =
    if (term.isEmpty || term.exists(c => c < 'a' || c > 'z')) lit(false)
    else if (isExact) array_contains(words, term)
    else if (term.length <= conf.minCharForMatch) lit(false) // quirk
    else exists(words, w => w.startsWith(term))

  /** (conv_id, turn_idx, query_id) for every document matching each
    * registered query; query_id is the input position. Invalid queries
    * match nothing. */
  def matches(corpus: Dataset[Turn], queries: Seq[String],
      conf: EngineConf = EngineConf.default): DataFrame = {
    import corpus.sparkSession.implicits._
    matchesUnsorted(corpus, queries, conf)
      .orderBy($"conv_id", $"turn_idx", $"query_id")
  }

  /** [[matches]] without the presentation sort — STATELESS, so it runs
    * unchanged on a STREAMING Dataset[Turn] (append mode, no state store,
    * no watermark): the percolation form of an alerting loop. */
  def matchesUnsorted(corpus: Dataset[Turn], queries: Seq[String],
      conf: EngineConf = EngineConf.default): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.tokenize.GraftFunctions.register(spark)
    val words = array_distinct(
      call_function("graft_tokenize", coalesce($"text", lit(""))))
    val preds: Seq[(Int, Column)] = queries.zipWithIndex.flatMap {
      case (q, qi) =>
        val parsed = QueryParser.parse("(" + q + ")", conf.exactMatch)
        if (!parsed.valid || parsed.searchWords.isEmpty) None
        else {
          val alg = new ResultAlgebra[Column] {
            def empty: Column = lit(false)
            def term(i: Int): Column = {
              val (t, e) = parsed.searchWords(i)
              termCond($"w", t, e, conf)
            }
            def or(a: Column, x: Column): Column = a || x
            def and(a: Column, x: Column): Column = a && x
            def not(a: Column, x: Column): Column = a && !x
          }
          parsed.eval(alg).map(qi -> _)
        }
    }
    if (preds.isEmpty)
      // filter(false), not limit(0): limit is unsupported on STREAMING
      // frames, and this path must keep the all-invalid-queries contract
      // ("matches nothing") for the streaming alerting loop too
      return corpus.toDF()
        .select($"conv_id", $"turn_idx", lit(0).as("query_id"))
        .filter(lit(false))
    corpus.toDF()
      .withColumn("w", words)
      .select($"conv_id", $"turn_idx",
        explode(filter(
          array(preds.map { case (qi, p) =>
            when(p, lit(qi)).otherwise(lit(null).cast("int")) }: _*),
          c => c.isNotNull)).as("query_id"))
  }
}
