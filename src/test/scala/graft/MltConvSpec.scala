package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.Turn
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** More-like-this and the conversation rollup over a MULTI-TURN corpus:
  * MLT against a local brute-force BM25 over the chosen seed terms, the
  * rollup against an independent aggregation of searchCount's
  * (oracle-validated) hit frame. */
class MltConvSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus: Seq[Turn] =
    TranscriptGen.dataset(spark, 40).collect().toSeq

  private lazy val idxDir: String = {
    val dir = tmpDir("graft-mlt-idx")
    IndexBuilder.build(spark, spark.createDataset(corpus), dir)
    dir
  }
  private lazy val searcher = new Searcher(spark, new IndexStore(idxDir))

  // local mirror of the index model: per-doc kept tokens, dl, df, N, avgdl
  private lazy val toks: Map[(String, Int), Seq[String]] =
    corpus.map(t => (t.conv_id, t.turn_idx) ->
      Tokenizer.tokens(t.text).toSeq).toMap
  private lazy val nDocs: Double = corpus.size.toDouble
  private lazy val avgdl: Double =
    toks.values.map(_.size).sum.toDouble / nDocs
  private lazy val dfOf: Map[String, Long] =
    toks.values.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.size.toLong).toMap

  private def idf(df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  private def bruteMlt(convId: String, turnIdx: Int, nTerms: Int, k: Int)
      : Seq[((String, Int), Double)] = {
    val seed = toks.getOrElse((convId, turnIdx), Seq.empty)
    val tf = seed.groupBy(identity).view.mapValues(_.size).toMap
    val chosen = tf.keys.toSeq.sorted
      .map(t => (t, tf(t) * idf(dfOf(t))))
      .sortBy { case (t, s) => (-s, t) }.take(nTerms).map(_._1)
    val scores = toks.toSeq.flatMap { case (key, dtoks) =>
      if (key == ((convId, turnIdx))) None
      else {
        val dtf = dtoks.groupBy(identity).view.mapValues(_.size).toMap
        val dl = dtoks.size.toDouble
        val s = chosen.flatMap(t => dtf.get(t).map { f =>
          idf(dfOf(t)) * (f * (1.2 + 1.0)) /
            (f + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        }).sum
        if (s > 0) Some(key -> s) else None
      }
    }
    scores.sortBy { case ((c, t), s) => (-s, c, t) }.take(k)
  }

  test("moreLikeThis matches brute force on the multi-turn corpus") {
    for (seedKey <- Seq(corpus.head, corpus(7), corpus(19))
           .map(t => (t.conv_id, t.turn_idx));
         nTerms <- Seq(2, 4)) {
      val exp = bruteMlt(seedKey._1, seedKey._2, nTerms, 10)
      val got = searcher
        .moreLikeThis(spark.createDataset(corpus), seedKey._1, seedKey._2,
          nTerms, 10)
        .collect().map {
          case Row(c: String, t: Int, s: Double) => ((c, t), s)
        }.toSeq
      assert(got.map(_._1) == exp.map(_._1),
        s"seed=$seedKey nTerms=$nTerms keys")
      got.zip(exp).foreach { case ((gk, gs), (_, es)) =>
        assert(math.abs(gs - es) <= 1e-9 * math.max(1.0, math.abs(es)),
          s"seed=$seedKey key=$gk")
      }
    }
  }

  test("moreLikeThis handles unknown seed and bad params") {
    val ds = spark.createDataset(corpus)
    assert(searcher.moreLikeThis(ds, "nope", 0).isEmpty)
    assert(searcher.moreLikeThis(ds, corpus.head.conv_id,
      corpus.head.turn_idx, nTerms = 0).isEmpty)
    assert(searcher.moreLikeThis(ds, corpus.head.conv_id,
      corpus.head.turn_idx, k = 0).isEmpty)
  }

  test("searchConvTopK equals the rollup of searchCount's hits") {
    val q = "which would"
    val hits = searcher.searchCount(q)
    val exp = hits.groupBy($"conv_id")
      .agg(sum($"cnt").as("total_cnt"), count(lit(1)).as("n_turns"))
      .orderBy($"total_cnt".desc, $"conv_id").limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = searcher.searchConvTopK(q, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp)
    assert(got.nonEmpty)
    // the corpus is genuinely multi-turn: some conversation matches in
    // more than one turn, so the rollup aggregates across turn_idx
    assert(got.exists(_._3 > 1L))
  }

  private def bruteRelated(word: String, k: Int, minCoDf: Int)
      : Seq[(String, Long, Double)] = {
    // NB: Map.collect into tuple results rebuilds a Map (conv_id ->
    // turn_idx), silently collapsing a conversation's turns — filter+keySet
    val seedDocs = toks.filter(_._2.contains(word)).keySet
    if (seedDocs.isEmpty) return Seq.empty
    val dfSeed = dfOf(word).toDouble
    toks.toSeq.filter(kv => seedDocs(kv._1))
      .flatMap(_._2.distinct).filterNot(_ == word)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 >= minCoDf)
      .map { case (t, c) =>
        (t, c, math.log((c.toDouble * nDocs) / (dfSeed * dfOf(t).toDouble)))
      }
      .sortBy { case (t, _, p) => (-p, t) }.take(k)
  }

  test("relatedTerms matches brute-force PMI; degenerate seeds empty") {
    val ds = spark.createDataset(corpus)
    for (w <- Seq("which", "would", "people"); k <- Seq(5, 10)) {
      val exp = bruteRelated(w, k, minCoDf = 2)
      val got = searcher.relatedTerms(ds, w, k).collect().map {
        case Row(t: String, c: Long, p: Double) => (t, c, p)
      }.toSeq
      assert(got == exp, s"related($w, $k)")
    }
    // unknown seed, multi-word input, empty input: empty, no crash
    assert(searcher.relatedTerms(ds, "zzzznotaword", 5).collect().isEmpty)
    assert(searcher.relatedTerms(ds, "which would", 5).collect().isEmpty)
    assert(searcher.relatedTerms(ds, "", 5).collect().isEmpty)
  }
}
