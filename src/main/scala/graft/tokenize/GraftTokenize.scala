package graft.tokenize

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_tokenize(text)` — the reference tokenizer (T1/T2: CharFold +
  * interior 5-14 / final 4-19 length rules) as a native Catalyst expression
  * with code generation: the generated Java calls the static
  * [[GraftTokenize.tokenize]], so the call stays inside whole-stage codegen
  * with no UDF serialization boundary or internal/external row conversion.
  *
  * Registered as a SQL function by [[GraftExtensions]]
  * (`--conf spark.sql.extensions=graft.tokenize.GraftExtensions`) or
  * imperatively via [[GraftFunctions.register]].
  */
case class GraftTokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokenize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    GraftTokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.tokenize.GraftTokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftTokenize {
  /** Static entry for generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val toks = Tokenizer.tokens(s.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  private[tokenize] val info = new ExpressionInfo(
    classOf[GraftTokenize].getName, null, "graft_tokenize",
    "_FUNC_(text) - reference-faithful tokenization: accent-folded lowercase words, interior length 5-14, final token 4-19.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[tokenize] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_tokenize takes exactly one argument")
    GraftTokenize(children.head)
  }
}

/** The engine's native SQL functions — ONE table consumed by both
  * registration paths, so the extension-configured and imperative routes
  * can never drift. */
object GraftFunctions {
  private[tokenize] val all: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_tokenize", GraftTokenize.info, GraftTokenize.builder _),
    ("graft_phrase_count", GraftPhraseCount.info, GraftPhraseCount.builder _),
    ("graft_near_count", GraftNearCount.info, GraftNearCount.builder _),
    ("graft_onear_count", GraftNearCount.orderedInfo,
      GraftNearCount.orderedBuilder _),
    ("graft_nearall_count", GraftNearAllCount.info,
      GraftNearAllCount.builder _),
    ("graft_postings", graft.index.GraftPostings.info,
      graft.index.GraftPostings.builder _),
    ("graft_shingles", graft.pipeline.GraftShingles.info,
      graft.pipeline.GraftShingles.builder _),
    ("graft_fphash", graft.pipeline.GraftFpHash.info,
      graft.pipeline.GraftFpHash.builder _),
    ("graft_repstats", graft.pipeline.GraftRepStats.info,
      graft.pipeline.GraftRepStats.builder _),
    ("graft_simhash", graft.pipeline.GraftSimhash.info,
      graft.pipeline.GraftSimhash.builder _),
    ("graft_quality", graft.pipeline.GraftQuality.info,
      graft.pipeline.GraftQuality.builder _),
    ("graft_langhits", graft.pipeline.GraftLangHits.info,
      graft.pipeline.GraftLangHits.builder _),
    ("graft_dot", graft.pipeline.GraftDot.info,
      graft.pipeline.GraftDot.builder _),
    ("graft_norm2", graft.pipeline.GraftNorm2.info,
      graft.pipeline.GraftNorm2.builder _),
    ("graft_argmin_cell", graft.pipeline.GraftArgminCell.info,
      graft.pipeline.GraftArgminCell.builder _),
    ("graft_posgrams", graft.pipeline.GraftPosGrams.info,
      graft.pipeline.GraftPosGrams.builder _),
    ("graft_despan", graft.pipeline.GraftDespan.info,
      graft.pipeline.GraftDespan.builder _),
    ("graft_hashvec", graft.pipeline.GraftHashVec.info,
      graft.pipeline.GraftHashVec.builder _),
    ("graft_minhash_bands", graft.pipeline.GraftMinhash.info,
      graft.pipeline.GraftMinhash.builder _))

  /** Imperative registration for an already-running session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}

/** SparkSessionExtensions hook (`--conf spark.sql.extensions=
  * graft.tokenize.GraftExtensions`): same function table. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
