package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_posgrams(text, k)` — ALL word k-grams of a text in token order
  * (array index = 0-based start position), as a native codegen expression.
  * The positional sibling of [[GraftShingles]] (which dedups): span-level
  * dedup needs every occurrence at its position, because a repeated gram
  * WITHIN one doc is itself a duplicated span. Same ws-token kernel
  * ([[GraftShingles.wsSplit]]), one string pass, no shuffle, no
  * interpreted lambdas. Empty array when the doc has fewer than k tokens.
  */
case class GraftPosGrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_posgrams requires (string, positive k), got ${child.dataType}, $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_posgrams"

  override def nullSafeEval(input: Any): Any =
    GraftPosGrams.posGrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.GraftPosGrams.posGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftPosGrams {
  /** Static entry for generated code: every k-gram in order. */
  def posGrams(s: UTF8String, k: Int): ArrayData = {
    val toks = GraftShingles.wsSplit(s)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftPosGrams].getName, null, "graft_posgrams",
    "_FUNC_(text, k) - all word k-grams in token order (index = position).",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_posgrams takes (text, k)")
    require(children(1).foldable,
      "graft_posgrams k must be a constant expression")
    val k = children(1).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_posgrams k must be an integer literal, got $other")
    }
    GraftPosGrams(children.head, k)
  }
}
