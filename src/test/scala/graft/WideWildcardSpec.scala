package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.index.{IndexBuilder, IndexStore}
import graft.model.{DocKey, EngineConf, Turn}
import graft.search.Searcher
import graft.verify.Oracle

/** Wide-wildcard stress (r1 verdict done-criterion): a 5-char prefix that
  * matches 1500+ dictionary words must run through the WAND path — the
  * matched words stay a broadcast-joined frame, never a driver In-list —
  * and stay rank-identical to the oracle. */
class WideWildcardSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 256,
    blockSize = 16)
  private val Base = Timestamp.valueOf("2026-03-01 00:00:00")

  /** 1500 distinct words sharing the 5-char prefix "stres" + filler. */
  private def word(i: Int): String = f"stres${('a' + i / 26 / 26).toChar}" +
    s"${('a' + i / 26 % 26).toChar}${('a' + i % 26).toChar}"

  private lazy val corpus: Seq[Turn] = (0 until 500).map { d =>
    val rnd = new scala.util.Random(555L + d)
    val words = (0 until 12).map(_ => word(rnd.nextInt(1500))) :+ "anchor"
    Turn(f"conv-$d%06d", 0, "doc", words.mkString(" "), null,
      new Timestamp(Base.getTime + d * 1000L))
  }

  test("a 5-char prefix matching 1500 dictionary words runs and ranks correctly") {
    val dir = tmpDir("graft-wide")
    IndexBuilder.build(spark,
      spark.createDataset(corpus).repartition(4), dir, conf)
    val store = new IndexStore(dir)
    // the dictionary really is wide under this prefix
    assert(store.dict(spark)
      .filter($"term".startsWith("stres")).count() >= 1000)

    val oracle = new Oracle(conf).indexAll(corpus)
    val searcher = new Searcher(spark, store, conf)

    // WAND path (pure wildcard query)
    val got = searcher.searchBm25("stres", 10).collect().map {
      case Row(c: String, t: Int, s: Double) => (DocKey(c, t), s) }.toSeq
    val exp = oracle.searchBm25("stres", 10)
    assert(got.map(_._1) == exp.map(_._1))
    got.zip(exp).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) <= 1e-9 * math.max(1.0, math.abs(es)))
    }

    // boolean path with the same wide prefix
    val gotC = searcher.searchCount("(stres AND \"anchor\")").collect().map {
      case Row(c: String, t: Int, n: Long) => DocKey(c, t) -> n }.toMap
    assert(gotC == oracle.searchCount("(stres AND \"anchor\")").toMap)
    searcher.close()
  }
}
