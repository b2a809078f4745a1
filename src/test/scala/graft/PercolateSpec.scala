package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.{DocKey, EngineConf}
import graft.search.{Percolator, Searcher}

/** Reverse search: percolate membership must agree EXACTLY with the
  * indexed search path's hit set for the same query over the same corpus
  * — the two implementations share only the tokenizer and the parser, so
  * the identity cross-validates both. And the plan must be one map-side
  * projection: zero exchanges, no joins. */
class PercolateSpec extends SparkTestBase {

  private val NConvs = 40
  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64,
    blockSize = 16)

  private lazy val corpus = TranscriptGen.dataset(spark, NConvs.toLong,
    partitions = 4)

  private lazy val searcher: Searcher = {
    val dir = tmpDir("graft-perc-idx")
    IndexBuilder.build(spark, corpus, dir, conf)
    new Searcher(spark, new IndexStore(dir), conf)
  }

  private val Queries = Seq(
    "(which AND would)", "\"there\"", "(which NOT would)",
    "((\"search\" OR \"index\") AND which)", "whichever",
    "word",        // 4-char wildcard: min-char quirk → matches nothing
    "((((broken",  // malformed → matches nothing
    "zzzz")        // no hits

  test("percolate membership == the indexed hit set, query by query") {
    val got = Percolator.matches(corpus, Queries, conf).collect().map {
      case Row(c: String, t: Int, q: Int) => (q, DocKey(c, t))
    }.toSet
    val expect = Queries.zipWithIndex.flatMap { case (q, qi) =>
      searcher.searchCount(q).collect().map {
        case Row(c: String, t: Int, _) => (qi, DocKey(c, t))
      }
    }.toSet
    assert(got === expect)
    assert(got.map(_._1).intersect(Set(5, 6, 7)).isEmpty) // quirks hold
    assert(got.nonEmpty)
  }

  test("seeded fuzz: percolate == indexed hits on random boolean queries") {
    val rnd = new scala.util.Random(0x9E4C0)
    val vocab = Vector("which", "whichever", "would", "there", "search",
      "assistant", "word", TranscriptGen.UniqueWord)
    def word(): String = {
      val w = vocab(rnd.nextInt(vocab.length))
      if (rnd.nextBoolean()) "\"" + w + "\"" else w
    }
    def query(): String = rnd.nextInt(5) match {
      case 0 => word()
      case 1 => s"(${word()} AND ${word()})"
      case 2 => s"(${word()} OR ${word()})"
      case 3 => s"(${word()} NOT ${word()})"
      case _ => s"((${word()} OR ${word()}) NOT ${word()})"
    }
    for (round <- 0 until 6) {
      val qs = Seq.fill(1 + rnd.nextInt(4))(query())
      val got = Percolator.matches(corpus, qs, conf).collect().map {
        case Row(c: String, t: Int, q: Int) => (q, DocKey(c, t))
      }.toSet
      val expect = qs.zipWithIndex.flatMap { case (q, qi) =>
        searcher.searchCount(q).collect().map {
          case Row(c: String, t: Int, _) => (qi, DocKey(c, t))
        }
      }.toSet
      assert(got === expect, s"round=$round qs=$qs")
    }
  }

  test("the percolation plan is one map-side pass: zero exchanges") {
    val plan = Percolator.matches(corpus, Queries, conf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the orderBy is the only allowed exchange (result presentation);
    // strip everything after it: upstream there must be NO exchange, no
    // join, no aggregate — queries compile into the projection itself
    val upstream = plan.split("\n").dropWhile(l => !l.contains("Sort"))
      .mkString("\n")
    assert(!upstream.contains("SortMergeJoin"), plan)
    assert(!upstream.contains("BroadcastHashJoin"), plan)
    assert(!upstream.contains("HashAggregate"), plan)
    // exactly ONE exchange in the whole plan: the final presentation sort
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, plan) // rangepartitioning prints once per node
  }

  test("streaming percolation == batch percolate, any batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = TranscriptGen.local(NConvs)
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.model.Turn]
    val root = tmpDir("graft-perc-stream")
    val qs = Queries.take(5)
    val q = graft.streaming.StreamingPercolator.start(
      source.toDS(), qs, s"$root/alerts", s"$root/ckpt", conf)
    try {
      // deliberately uneven batch boundaries
      Seq(all.take(7), all.slice(7, 200), all.drop(200)).foreach { chunk =>
        source.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$root/alerts").collect().map {
      case Row(c: String, t: Int, qi: Int) => (qi, DocKey(c, t))
    }.toSet
    val batch = Percolator.matches(corpus, qs, conf).collect().map {
      case Row(c: String, t: Int, qi: Int) => (qi, DocKey(c, t))
    }.toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming with only invalid queries runs and alerts nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.model.Turn]
    val root = tmpDir("graft-perc-empty")
    // limit(0) would be rejected by the streaming analyzer — the
    // all-invalid path must still start and simply produce no alerts
    val q = graft.streaming.StreamingPercolator.start(
      source.toDS(), Seq("((((broken", ""), s"$root/alerts",
      s"$root/ckpt", conf)
    try {
      source.addData(TranscriptGen.local(3))
      q.processAllAvailable()
    } finally q.stop()
    val n = try spark.read.parquet(s"$root/alerts").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(n === 0L)
  }

  test("no valid queries → empty with the right schema") {
    assert(Percolator.matches(corpus, Seq("((((broken", ""), conf)
      .collect().isEmpty)
    assert(Percolator.matches(corpus, Nil, conf).columns ===
      Array("conv_id", "turn_idx", "query_id"))
  }
}
