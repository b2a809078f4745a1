package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.tokenize.Tokenizer

/** `graft_hashvec(text, dim)` — the hashing trick (feature hashing,
  * Weinberger et al. 2009; public literature's model-free text
  * vectorizer): a `dim`-wide signed-count vector with
  * `v[(h/2) mod dim] += ±1` per kept-token occurrence, where `h` is the
  * engine's 31-bit rolling token hash ([[GraftFpHash]]) and the sign is
  * its low bit (the unbiased-inner-product variant). One map-side codegen
  * pass over [[Tokenizer.tokens]] — no vocabulary, no shuffle, no
  * external model — bridging the text corpus into the embedding-side
  * family (brute/LSH/IVF ANN, semantic dedup) as a deterministic,
  * SQL-mirrorable `array<float>` column. Values are small signed integer
  * counts (exact in float up to 2^24). Null text → null.
  */
case class GraftHashVec(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hashvec requires a string column, got ${child.dataType}")
    else if (dim < 1)
      TypeCheckResult.TypeCheckFailure("graft_hashvec dim must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hashvec"

  override def nullSafeEval(input: Any): Any =
    GraftHashVec.vec(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.GraftHashVec.vec($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftHashVec {

  /** Static entry for generated code: one tokenizer pass, primitive
    * accumulation, zero boxing (UnsafeArrayData wraps the float[]). */
  def vec(s: UTF8String, dim: Int): ArrayData = {
    val toks = Tokenizer.tokens(s.toString)
    val v = new Array[Float](dim)
    var i = 0
    while (i < toks.length) {
      val h = GraftFpHash.hashStr(toks(i))
      val idx = ((h >> 1) % dim).toInt
      v(idx) += (if ((h & 1L) == 0L) 1f else -1f)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(v)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftHashVec].getName, null, "graft_hashvec",
    "_FUNC_(text, dim) - signed feature-hashing vector of the kept-token " +
      "stream: v[(h/2) mod dim] += sign(h) per occurrence.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_hashvec takes (text, dim)")
    require(children(1).foldable,
      "graft_hashvec dim must be a constant expression")
    val dim = children(1).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_hashvec dim must be an integer literal, got $other")
    }
    GraftHashVec(children.head, dim)
  }
}
