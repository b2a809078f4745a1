package graft

import graft.fixtures.TranscriptGen
import graft.tokenize.{GraftFunctions, Tokenizer}

/** The codegen tokenizer expression: identical to the Scala tokenizer under
  * both whole-stage codegen and interpreted evaluation. */
class GraftTokenizeSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_tokenize == Tokenizer.tokens under codegen and interpreted") {
    GraftFunctions.register(spark)
    val texts = TranscriptGen.local(30).map(_.text) ++ Seq(
      "", "   ", "ab", "word", "abcdefghijklmnopqrstuvwxyz",
      "Mixed CASE Äpfel naïve FAÇADE ends-with four", "straightforwardly")
    val df = texts.toDF("text")
    def run(): Seq[Seq[String]] =
      df.selectExpr("graft_tokenize(text)").as[Seq[String]].collect().toSeq
    val expected = texts.map(t => Tokenizer.tokens(t).toSeq)

    assert(run() == expected) // whole-stage codegen (default on)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("expression is usable inside a SQL aggregation") {
    GraftFunctions.register(spark)
    val df = TranscriptGen.local(20).toDF()
    df.createOrReplaceTempView("turns")
    val viaSql = spark.sql(
      """SELECT term, count(*) AS df FROM (
        |  SELECT explode(array_distinct(graft_tokenize(text))) AS term
        |  FROM turns) GROUP BY term ORDER BY term""".stripMargin)
      .as[(String, Long)].collect().toMap
    val local = TranscriptGen.local(20)
      .flatMap(t => Tokenizer.tokenSet(t.text))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(viaSql == local)
  }
}
