package graft

import graft.index.Codec
import graft.tokenize.GraftFunctions

/** The posting-decode generator: identical output under whole-stage codegen
  * (the CollectionGenerator/inline path) and interpreted evaluation, and
  * the Generate node stays INSIDE the codegen span (r2 shipped it as
  * CodegenFallback, breaking the span at every decode). */
class GraftPostingsSpec extends SparkTestBase {
  import spark.implicits._

  private def parts: Seq[(Int, Array[Byte])] = {
    val rnd = new scala.util.Random(7)
    (0 until 6).map { pid =>
      var doc = rnd.nextInt(100).toLong
      val ps = (0 until (1 + rnd.nextInt(400))).map { _ =>
        doc += 1 + rnd.nextInt(50)
        Codec.Posting(doc, 1 + rnd.nextInt(9), 1 + rnd.nextInt(300))
      }
      pid -> Codec.encode(ps, blockSize = 16)
    } :+ (99 -> Codec.encode(Nil, 16)) // empty part decodes to zero rows
  }

  test("graft_postings == Codec.decodeAll under codegen and interpreted") {
    GraftFunctions.register(spark)
    val df = parts.toDF("pid", "bytes")
    def run(): Map[Int, Seq[(Long, Int, Int)]] =
      df.selectExpr("pid", "graft_postings(bytes)")
        .as[(Int, Long, Int, Int)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap
    val expected = parts.map { case (pid, b) =>
      pid -> Codec.decodeAll(b).toSeq.map(p => (p.docId, p.tf, p.dl))
    }.filter(_._2.nonEmpty).toMap

    assert(run() == expected) // whole-stage codegen (default on)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("the Generate node participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = parts.toDF("pid", "bytes").selectExpr("pid", "graft_postings(bytes)")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted explain tags codegen'd operators with [codegen id : N]
    assert("Generate.*\\[codegen id : \\d+\\]".r.findFirstIn(plan).isDefined,
      s"Generate fell out of codegen:\n$plan")
  }
}
