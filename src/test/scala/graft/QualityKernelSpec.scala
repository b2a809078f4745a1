package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextStats
import graft.tokenize.GraftFunctions

/** The native one-pass `graft_quality` kernel must be BIT-IDENTICAL to
  * the column-expression form it replaced (whose arithmetic the SQL
  * oracle restates): `filter(toks, isin(stopwords))` + a
  * `regexp_extract_all('[^A-Za-z0-9\s]')` scan + `length()`. */
class QualityKernelSpec extends SparkTestBase {
  import spark.implicits._

  /** The legacy column form — kept here as the executable spec. */
  private def legacyCounts(df: DataFrame): DataFrame = {
    val toks = TextStats.wsTokens(col("text"))
    df.select(col("doc_id"),
      length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, t => t.isin(TextStats.Stopwords.map(lit): _*)))
        .cast("long").as("n_stop"),
      size(expr(
        "regexp_extract_all(coalesce(text, ''), '[^A-Za-z0-9\\\\s]', 0)"))
        .cast("long").as("n_punct"))
  }

  private val rnd = new scala.util.Random(0xBEEF)
  private def randText(): String = {
    val parts = Vector("the", "a", "of", "words", "x!", "a,b", "naïve",
      "🙂", "词", "1two3", "...", "", " ", " ", "tab\there")
    (0 until rnd.nextInt(25)).map(_ => parts(rnd.nextInt(parts.length)))
      .mkString(" ")
  }

  test("graft_quality == legacy column form on adversarial strings") {
    GraftFunctions.register(spark)
    val rows = (Seq("", " ", "the a of", "no stops here!", " nbsp")
      ++ (0 until 300).map(_ => randText()))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val native = df.select($"doc_id",
        call_function("graft_quality", coalesce($"text", lit(""))).as("q"))
      .select($"doc_id", $"q.n_chars", $"q.n_tokens", $"q.n_stop",
        $"q.n_punct")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val legacy = legacyCounts(df)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(native == legacy)
  }

  test("quality end-to-end unchanged: ratios and verdicts") {
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near a river"),
      (1L, "x"),
      (2L, null: String)
    ).toDF("doc_id", "text")
    val q = TextStats.quality(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_stop"),
          r.getAs[Double]("stop_ratio"), r.getAs[Boolean]("keep")))).toMap
    assert(q(0L)._1 == 12L && q(0L)._2 == 3L) // the, the, a
    assert(q(0L)._3 == 3.0 / 12.0 && q(0L)._4)
    assert(!q(1L)._4 && !q(2L)._4)
  }
}
