package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_fphash(text)` — the engine's rolling polynomial hash
  * `fold (acc*31 + codepoint) mod 2^31` as a native codegen expression:
  * one pass over the string's code points, no per-character string split
  * (the HOF form `aggregate(split(text, ''), ...)` allocates a
  * single-char UTF8String per character AND evaluates the lambda
  * interpreted — it sat inside the minhash signature path once per
  * shingle). Bit-identical to the SQL oracle's `ascii()` fold: `ascii`
  * of a one-codepoint string IS the code point, and Java regex splits
  * never cut surrogate pairs. */
case class GraftFpHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fphash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fphash"

  override def nullSafeEval(input: Any): Any =
    GraftFpHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GraftFpHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftFpHash {
  /** Static entry for generated code. */
  def hash(s: UTF8String): Long = hashStr(s.toString)

  /** String form — for callers that already hold a String (avoids a
    * UTF8String round trip per token on the simhash path). */
  def hashStr(str: String): Long = {
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % TextStats.FpMod
      i += Character.charCount(cp)
    }
    acc
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftFpHash].getName, null, "graft_fphash",
    "_FUNC_(text) - rolling polynomial hash: fold (acc*31 + codepoint) mod 2^31.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_fphash takes exactly one argument")
    GraftFpHash(children.head)
  }
}
