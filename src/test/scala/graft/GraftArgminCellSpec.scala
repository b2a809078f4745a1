package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.tokenize.GraftFunctions

/** The native IVF cell-assignment kernel (`graft_argmin_cell`): parity
  * with a brute-force argmin, the null/length contract, identical output
  * under codegen and interpreted eval, and the projection staying inside
  * the whole-stage-codegen span — this replaced the engine's last per-row
  * boxed UDF (r3 verdict item). */
class GraftArgminCellSpec extends SparkTestBase {
  import spark.implicits._

  // 4 centroids in 3-d, deliberately including exact-tie geometry
  private val cents: Array[Array[Double]] = Array(
    Array(0.0, 0.0, 0.0),
    Array(1.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0),
    Array(10.0, 10.0, 10.0))
  private val flat = cents.flatten
  private val dim = 3

  private def brute(v: Array[Float]): Int = {
    val ds = cents.map(c => c.zip(v).map { case (ci, vi) =>
      (vi - ci) * (vi - ci) }.sum)
    ds.indexOf(ds.min) // first minimum = lowest index on ties
  }

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    (0L until 200L).map(i =>
      i -> Array.fill(dim)((rnd.nextDouble() * 12 - 1).toFloat))
  }

  private def assignDf(df: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    df.select(col("id"),
      call_function("graft_argmin_cell", col("v"), lit(flat), lit(dim))
        .as("cell"))
  }

  test("argmin matches brute force on random float vectors") {
    val got = assignDf(vecs.toDF("id", "v")).as[(Long, Int)].collect().toMap
    vecs.foreach { case (i, v) => assert(got(i) == brute(v), s"vec $i") }
  }

  test("exact tie goes to the lower centroid index") {
    // (0.5, 0, 0) is equidistant from centroids 0 and 1
    val got = assignDf(Seq((0L, Array(0.5f, 0f, 0f))).toDF("id", "v"))
      .as[(Long, Int)].collect().toMap
    assert(got(0L) == 0)
  }

  test("null vector and wrong-length vector assign null") {
    val df = Seq(
      (0L, Array(0.1f, 0.2f, 0.3f)),
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array(0.1f, 0.2f)) // dim mismatch
    ).toDF("id", "v")
    val got = assignDf(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(got(0L).isDefined && got(1L).isEmpty && got(2L).isEmpty)
  }

  test("NaN element assigns null, not cell -1 (ADVICE r4)") {
    // NaN distances fail every < comparison, so argmin's best stays -1;
    // the contract is malformed-embedding → null (never a phantom cell
    // that silently vanishes from IVF probes)
    val df = Seq(
      (0L, Array(Float.NaN, 0.1f, 0.2f)),
      (1L, Array(0.1f, Float.NaN, Float.NaN)),
      (2L, Array(0.1f, 0.2f, 0.3f))
    ).toDF("id", "v")
    val got = assignDf(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(got(0L).isEmpty && got(1L).isEmpty && got(2L).isDefined)
  }

  test("codegen and interpreted eval agree") {
    val df = vecs.toDF("id", "v")
    def run(): Map[Long, Int] =
      assignDf(df).as[(Long, Int)].collect().toMap
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("the assignment projection stays inside whole-stage codegen") {
    // spark.range source: a local Seq would fold into LocalTableScan
    // array() not transform(): an HOF lambda is CodegenFallback and would
    // itself break the Project out of the span
    val df = spark.range(100).select(col("id"),
      array((0 until dim).map(i => (col("id") + i).cast("float")): _*).as("v"))
    val plan = assignDf(df).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("Project.*\\[codegen id : \\d+\\]".r.findFirstIn(plan).isDefined,
      s"expected a codegen'd Project, got:\n$plan")
  }

  test("ivfTopK still returns exact-cosine ranks within probed lists") {
    // smoke: the kernel swap must not change ivfTopK's output shape/rows
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 60L).map(i =>
      (i, Array.fill(4)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopK(corpus, queries, k = 5, nLists = 4,
      nProbe = 4).collect()
    assert(out.length == 15) // 3 queries × k=5, nProbe=nLists → exhaustive
  }
}
