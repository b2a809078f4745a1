package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextStats
import graft.tokenize.GraftFunctions

/** The native `graft_langhits` kernel must produce the exact per-profile
  * integers of the column form it replaced (one filter/isin lambda per
  * profile over the distinct token array). */
class LangIdKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def legacyScores(df: DataFrame): DataFrame = {
    val toks = array_distinct(TextStats.wsTokens(col("text")))
    val scored = df.select(col("doc_id"), toks.as("toks"))
    TextStats.LangProfiles.foldLeft(scored) { case (d, (lang, ws)) =>
      d.withColumn(s"s_$lang",
        size(filter(col("toks"), t => t.isin(ws.map(lit): _*))).cast("long"))
    }.drop("toks")
  }

  private val rnd = new scala.util.Random(0xFACADE)
  private def randText(): String = {
    val parts = Vector("the", "and", "of", "der", "die", "und", "el", "los",
      "que", "le", "les", "des", "de", "shi", "words", "naïve", "🙂", "")
    (0 until rnd.nextInt(20)).map(_ => parts(rnd.nextInt(parts.length)))
      .mkString(" ")
  }

  test("graft_langhits == legacy per-profile filter/isin scores") {
    GraftFunctions.register(spark)
    val rows = (Seq("", "the and of", "der die und the", "de shi le les")
      ++ (0 until 300).map(_ => randText()))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val cols = TextStats.LangProfiles.map { case (l, _) => s"s_$l" }
    val native = df.select($"doc_id",
        call_function("graft_langhits", coalesce($"text", lit(""))).as("q"))
      .select(col("doc_id") +: cols.map(c => col(s"q.$c").as(c)): _*)
      .collect().map(_.toString).sorted.toSeq
    val legacy = legacyScores(df).collect().map(_.toString).sorted.toSeq
    assert(native == legacy)
  }

  test("langId end-to-end: argmax, tie-break, und") {
    val df = Seq(
      (0L, "the and of everything"), // en
      (1L, "der die und"), // de
      (2L, "de le les des"), // fr 3 beats zh 2 ('de' AND 'le' are zh's)
      (3L, "de"), // only zh carries 'de': argmax, no tie
      (4L, "nothing matching here"),
      (5L, "le") // a REAL tie: fr 1 == zh 1 → earliest profile (fr) wins
    ).toDF("doc_id", "text")
    val got = TextStats.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang_pred"), r.getAs[Long]("hits")))).toMap
    assert(got(0L) == (("en", 3L)))
    assert(got(1L) == (("de", 3L)))
    assert(got(2L) == (("fr", 3L)))
    assert(got(3L) == (("zh", 1L)))
    assert(got(4L) == (("und", 0L)))
    assert(got(5L) == (("fr", 1L))) // dropping the tie-break would flip this
  }
}
